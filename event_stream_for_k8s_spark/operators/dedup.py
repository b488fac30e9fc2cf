"""Deduplication operators.

Reference semantics (SURVEY.md §2 A5/A6): the reference derives a
string key ``concat(uid, ':', resource_version)`` with missing parts
defaulting to ``""`` (cisco-open/event-stream-for-k8s
``src/types.rs:21-35``) and drops events whose key exists in committed
state (``src/tasks.rs:95-103``). The batch twins here reproduce that as
relational operators; the streaming twin lives in
``streaming.dedup_pipeline``.

Scale notes (100 TB): ``dedup_exact`` is a hash aggregation on the key
— one shuffle, map-side partial dedup for free, AQE handles skew.
``dedup_rank`` is a window — same single shuffle on the key but keeps a
deterministic "which row survives" contract, which the plain
``dropDuplicates`` does not.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_key(cols: Sequence[Column | str], sep: str = ":") -> Column:
    """Reference A5 key: sep-joined parts, NULL parts -> '' (so two
    keyless rows collide — intended, see SURVEY.md §3.4.5)."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")
        )
        for c in cols
    ]
    return F.concat_ws(sep, *parts)


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Reference A6 batch twin: keep one arbitrary row per key."""
    return df.dropDuplicates(list(keys))


def dedup_rank(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Deterministic dedup: first row per key under ``order``
    (win_dedup_rank — the oracle-checkable twin of A6)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
