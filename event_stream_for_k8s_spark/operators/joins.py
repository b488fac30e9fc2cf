"""Join operators Spark lacks natively: the as-of join.

``asof_join`` matches each left row to the latest right row with
``right_time <= left_time`` within a key (backward as-of; forward and
nearest variants are composed in ``plans/joins.py`` from this
primitive).

Implementation is the UNION + WINDOW formulation, not
join-then-filter-then-rank: tag both inputs, union them, and run a
single ``last(..., ignorenulls=True)`` window partitioned by key and
ordered by (time, side, tiebreak). Right rows deposit their payload;
left rows pick up the most recent deposit.

Scale rationale (100 TB): a naive ``left.join(right, key &
right.time <= left.time)`` materializes EVERY candidate pair before
ranking — quadratic blowup per key. The union+window form is one
shuffle on the key and one sort per partition: O(n log n), no pair
blowup, and it survives skewed keys via AQE. This is the same plan
shape DuckDB's native ASOF JOIN executes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join; keeps all left columns and adds
    ``<payload_col><suffix>`` columns from the matched right row.

    ``tiebreak``: right column ordering ties on right_time (last one
    wins) — pass a unique right key for a deterministic result.
    """
    from pyspark.sql import types as T

    on = list(on)
    lcols = left.columns
    # The deposit is ONE struct per right row, not one column per
    # payload field: last(col, ignorenulls) per-column would (a) skip
    # right rows whose payload value is NULL — the match must be the
    # latest right ROW even when its value is NULL (DuckDB/pandas
    # as-of semantics) — and (b) let different payload columns come
    # from DIFFERENT right rows when NULLs interleave. A struct is
    # non-null whenever the row exists, so one last() picks one row.
    p_type = T.StructType([T.StructField(c, right.schema[c].dataType) for c in payload])
    tagged_left = left.select(
        *on,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols if c not in on],
        F.lit(None).cast(p_type).alias("__p"),
    )
    # A NULL right_time never satisfies `right_time <= left_time`
    # (SQL comparison semantics) — without this filter a null-time
    # right row sorts nulls-first and becomes a phantom earliest
    # deposit for left rows that should match nothing.
    tagged_right = right.filter(F.col(right_time).isNotNull()).select(
        *on,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        F.struct(*[F.col(c).alias(c) for c in payload]).alias("__p"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    # Right rows (side=0) sort before left rows at equal time => a right
    # row at exactly left_time matches (<= semantics). last() ignorenulls
    # carries the latest deposit forward.
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__side", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = unioned.select(
        *unioned.columns,
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
    )
    return picked.filter(F.col("__side") == 1).select(
        *on,
        F.col("__t").alias(left_time),
        *[c for c in lcols if c not in on and c != left_time],
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in payload],
    )
