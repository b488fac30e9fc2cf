"""event_stream_for_k8s_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of ``cisco-open/event-stream-for-k8s`` (the reference, a
Rust streaming ETL daemon: k8s Event watch -> dedup-with-TTL -> NDJSON
sink -> grouped counters; see SURVEY.md §0), generalized to a full
relational + streaming + LLM-data-pipeline operator surface (SURVEY.md
§2 Part B), designed for 100 TB scale.

Layout:
- ``session``    SparkSession factory (AQE on, UTC, Arrow on)
- ``catalog``    test-table loaders (TPC-H-ish star schema + events)
- ``operators``  reusable relational operators (dedup, asof join, topk...)
- ``functions``  column-expression libraries (text, vectors, hashing)
- ``sources``    readers/sinks incl. the k8s Event envelope schema
- ``streaming``  Structured Streaming pipelines (watermark dedup, windows)
- ``plans``      the named-query registry checked against the DuckDB oracle
"""

__version__ = "0.1.0"
