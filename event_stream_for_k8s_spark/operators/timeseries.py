"""Gap-filling primitives over pre-gridded series.

``interp_linear`` is the core of the ``ts_interp_linear`` query
(plans/timeseries.py), extracted so property tests can drive it with
adversarial sparse grids (empty partitions, single observations,
edge-only observations) independent of the parquet fixtures — the
same extract-and-differential pattern as operators/range_count.py
and operators/maintenance.py. Reference parity: the fill family is
§2 Part C surface; cisco-open/event-stream-for-k8s has no
interpolation operator.

Scale rationale (100 TB): the input is the already-aggregated grid
(one row per (partition, tick) — |ticks| × |partitions| rows, not
the raw stream), and all four context scans below share ONE
(partition, time) shuffle+sort; no per-observation window ever runs
over raw data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def streak_runs(
    days: DataFrame, key_col: str, date_col: str
) -> DataFrame:
    """Gaps-and-islands over a DISTINCT (key, date) relation: one row
    per maximal run of consecutive dates, with ``len`` and
    ``streak_start``. The anchor trick (date minus the per-key
    row_number is constant exactly while dates are consecutive) keeps
    it one keyed shuffle; extracted from ``ts_streaks``
    (plans/timeseries.py) so the hypothesis differential can pit it
    against a direct consecutive-run Python spec — the DuckDB oracle
    replays the SAME anchor formulation, so a shared misconception
    there would hash-match; the independent spec would not.

    Input must be duplicate-free per (key, date); callers dedup first
    (``ts_streaks`` does ``.distinct()``).
    """
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy(date_col)
    )
    grp = days.select(
        key_col, date_col, F.date_sub(date_col, rn).alias("__anchor")
    )
    return grp.groupBy(key_col, "__anchor").agg(
        F.count("*").alias("len"),
        F.min(date_col).alias("streak_start"),
    ).drop("__anchor")


def interp_linear(
    grid: DataFrame,
    part_col: str,
    time_col: str,
    val_col: str,
    out_col: str = "v_interp",
) -> DataFrame:
    """Linearly interpolate NULL ``val_col`` rows between the nearest
    observed neighbors within each ``part_col`` series; edge rows with
    a neighbor on only one side clamp to that neighbor, and a series
    with no observations at all stays NULL.

    ``time_col`` must be numeric (e.g. integer epoch seconds): the
    interpolation weight is ``(t - prev_t) / (next_t - prev_t)`` in
    double arithmetic, evaluated in exactly this association order so
    engines replaying the formula (DuckDB oracle, the pure-Python
    hypothesis spec) produce bit-identical doubles.

    Returns ``grid``'s columns plus ``out_col``.
    """
    pv, ph, nv, nh = "__pv", "__ph", "__nv", "__nh"
    ctx = grid.selectExpr(
        "*",
        f"""last_value({val_col}) IGNORE NULLS OVER (
              PARTITION BY {part_col} ORDER BY {time_col}
              ROWS UNBOUNDED PRECEDING) AS {pv}""",
        f"""last_value(CASE WHEN {val_col} IS NOT NULL
                            THEN {time_col} END) IGNORE NULLS OVER (
              PARTITION BY {part_col} ORDER BY {time_col}
              ROWS UNBOUNDED PRECEDING) AS {ph}""",
        f"""first_value({val_col}) IGNORE NULLS OVER (
              PARTITION BY {part_col} ORDER BY {time_col}
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS {nv}""",
        f"""first_value(CASE WHEN {val_col} IS NOT NULL
                             THEN {time_col} END) IGNORE NULLS OVER (
              PARTITION BY {part_col} ORDER BY {time_col}
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              AS {nh}""",
    )
    filled = (
        F.when(F.col(val_col).isNotNull(), F.col(val_col))
        .when(F.col(pv).isNull(), F.col(nv))
        .when(F.col(nv).isNull(), F.col(pv))
        .otherwise(
            F.col(pv)
            + (F.col(nv) - F.col(pv))
            * (
                (F.col(time_col) - F.col(ph)).cast("double")
                / (F.col(nh) - F.col(ph)).cast("double")
            )
        )
    )
    return ctx.withColumn(out_col, filled).drop(pv, ph, nv, nh)
