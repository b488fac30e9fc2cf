"""Partition-width discipline shared across plans and operators.

The single-partition trap (SCALING.md §18): the test-SF corpus
parquet is one file, so any compute-dense stage downstream — an
Arrow/mapInPandas codec pass, a crossJoin similarity scan, a KMeans
fit — runs on ONE core while the other 31 idle. One narrow keyless
round-robin exchange buys full-width parallelism for everything
below it. At production scale the scan already has many partitions
and the helper is a structural no-op (the condition also keeps
post-shuffle inputs untouched, so no gratuitous second shuffle of
large payloads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cores(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full core width when the input has
    FEWER partitions; identity otherwise. Streaming relations pass
    through untouched (no static partition count to probe —
    micro-batch parallelism is the source's concern)."""
    if df.isStreaming:
        return df
    ncores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < ncores:
        return df.repartition(ncores)
    return df
