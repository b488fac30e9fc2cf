"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting covers most cases at runtime (enabled in
session.py); salting is the explicit fallback for pathological keys —
e.g. a single namespace producing 90% of k8s events, the reference's
4-dim counter key (A8) at cluster scale.

Salt is DERIVED (hash of a high-cardinality column mod n), never
random: deterministic results, replayable at-least-once sinks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, entropy_col: str, n: int = 16, salt_col: str = "__salt") -> DataFrame:
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(entropy_col)), F.lit(n))
    )


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    entropy_col: str,
    n: int = 16,
) -> DataFrame:
    """Two-phase skew-proof count: groupBy(key, salt) fans the hot key
    out over n reducers; the second phase combines n tiny partials."""
    partial = (
        salted(df, entropy_col, n)
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__c"))
    )
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    entropy_col: str,
    n: int = 16,
) -> DataFrame:
    """Skewed equi-join: salt the (big, skewed) left side, explode the
    (small) right side n ways so every salted partition finds its match.
    Right side grows n-fold — use only when right is modest."""
    lsalted = salted(left, entropy_col, n)
    rexp = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    return lsalted.join(rexp, [*on, "__salt"]).drop("__salt")
