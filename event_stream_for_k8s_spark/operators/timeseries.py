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


def funnel_stages(
    e: DataFrame,
    window_us: int,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Single-pass ordered-funnel core of ``ts_funnel``
    (plans/timeseries.py): per user, the first ``stages[0]``, the
    first ``stages[1]`` at-or-after it, and the first ``stages[2]``
    within ``window_us`` micros at-or-after THAT. Input columns:
    ``user_id``, ``event_type``, ``event_id`` (ordering tiebreak),
    ``t`` (epoch micros). Returns one row per user with nullable
    ``t_view``/``t_click``/``t_buy``.

    Rows sort by (t, stage-priority, event_id) so an equal-micros
    earlier stage is visible to the later stage's running MIN —
    the inclusive ``>=`` the join-chain formulation has naturally.
    One scan + one user-keyed shuffle regardless of stage count.
    """
    s0, s1, s2 = stages
    pri = (
        F.when(F.col("event_type") == s0, 0)
        .when(F.col("event_type") == s1, 1)
        .when(F.col("event_type") == s2, 2)
        .otherwise(3)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", pri, "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_view = F.min(F.when(F.col("event_type") == s0, F.col("t"))).over(w)
    click_ok = (F.col("event_type") == s1) & (F.col("t") >= run_view)
    run_click = F.min(F.when(click_ok, F.col("t"))).over(w)
    buy_ok = (
        (F.col("event_type") == s2)
        & (F.col("t") >= run_click)
        & (F.col("t") <= run_click + F.lit(window_us))
    )
    staged = e.select(
        "user_id",
        F.when(F.col("event_type") == s0, F.col("t")).alias("tv"),
        F.when(click_ok, F.col("t")).alias("tc"),
        F.when(buy_ok, F.col("t")).alias("tb"),
    )
    return staged.groupBy("user_id").agg(
        F.min("tv").alias("t_view"),
        F.min("tc").alias("t_click"),
        F.min("tb").alias("t_buy"),
    )


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
