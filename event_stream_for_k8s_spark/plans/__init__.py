"""Named-query registry — the implementation contract of SURVEY.md §2.

Importing this package populates ``REGISTRY`` with every implemented
operator query. ``__spark_entry__.py`` exposes it to the driver.
"""

from event_stream_for_k8s_spark.plans.registry import REGISTRY, Query, query

# Import for side effects: each module registers its queries.
from event_stream_for_k8s_spark.plans import (  # noqa: E402,F401
    reference,
    scans,
    relational,
    joins,
    windows,
    functions,
    graph,
    llm,
    maintenance,
    streaming_queries,
    timeseries,
    tpch_partsupp,
    udfs,
)

__all__ = ["REGISTRY", "Query", "query"]
