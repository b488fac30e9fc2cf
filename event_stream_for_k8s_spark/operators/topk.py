"""Top-k operators.

``top_k`` is orderBy+limit — Catalyst plans TakeOrderedAndProject,
which is a per-partition heap + single-driver merge: no full sort, no
full shuffle; this is already the right 100 TB plan.

``top_k_per_group`` is a window rank + filter — one shuffle on the
group key. At scale prefer a pre-aggregation if k is small and groups
are few; the window form is the general, skew-tolerant (AQE) one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order: Sequence[Column | str], k: int) -> DataFrame:
    return df.orderBy(*order).limit(k)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    order: Sequence[Column | str],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Deterministic per-group top-k: pass a tie-breaking ``order``."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
