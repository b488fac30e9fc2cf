"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``event_stream_for_k8s_spark`` -- this module
only adapts the query registry (SURVEY.md S2 inventory) to the driver
contract.

Historical note: rounds 2-6 carried a rotating ``DRIVER_PROBES`` alias
list (early-sorting ``a_chk_*`` duplicates) so the driver's first-50
sample would eventually attest every registry entry; round 10 revived
it once for the 14 queries whose current oracle shape had never had a
driver row. CORRECTNESS_r10 recorded all 14 green, so the mechanism is
retired for good (VERDICT r10 "Next round" #1): ``queries()`` now
returns exactly the registry names, and the driver's window samples
the real alphabetical head (the agg_* block).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_dedup_count"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md S2."""
    return {name: q.spark for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {
        name: q.oracle
        for name, q in sorted(REGISTRY.items())
        if q.oracle is not None
    }
