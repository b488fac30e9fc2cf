"""Window functions — SURVEY.md §2 B.5.

Every window here orders by a UNIQUE key chain (tie-broken), so rank
assignment is deterministic and oracle-checkable. One shuffle per
distinct partitioning; at 100 TB co-partition consecutive windows on
the same key so the exchange is reused (Catalyst already merges
adjacent windows with identical partitioning/ordering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.operators import dedup_key, dedup_rank
from event_stream_for_k8s_spark.plans.registry import query


@query(
    "win_rank",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
       row_number() OVER w AS rn,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4)     OVER w AS quartile
FROM lineitem
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber, l_partkey, l_suppkey)
""",
    section="B.5",
    notes="declared B.5 semantics: full ranking surface over one "
    "window. SCALE WARNING — the partition key l_returnflag has 3 "
    "distinct values, so each window partition is ~N/3 rows sorted in "
    "ONE task (sf1 soak ratio 7.0, sort-dominated). At 100 TB do NOT "
    "copy this shape: if only the top rows per group matter use "
    "topk_per_group (partial-agg pruned), or pre-bucket by a "
    "composite key and rank within buckets",
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_analytic",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity,
       lag(l_quantity)  OVER w AS prev_qty,
       lead(l_quantity) OVER w AS next_qty,
       first_value(l_extendedprice) OVER w AS first_price,
       last_value(l_extendedprice)
         OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price
FROM lineitem
WINDOW w AS (PARTITION BY l_orderkey
             ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice)
""",
    section="B.5",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lag("l_quantity").over(w).alias("prev_qty"),
        F.lead("l_quantity").over(w).alias("next_qty"),
        F.first("l_extendedprice").over(w).alias("first_price"),
        F.last("l_extendedprice").over(w_full).alias("last_price"),
    )


@query(
    "win_frame_rows",
    oracle="""
SELECT l_orderkey, l_linenumber,
       cast(sum(cast(l_quantity AS bigint))
         OVER (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey, l_extendedprice
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS bigint) AS running_qty
FROM lineitem
""",
    section="B.5",
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Quantities are integral: the running sum stays in exact int64.
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("bigint")).over(w).alias("running_qty"),
    )


@query(
    "win_frame_range",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       count(*) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
                      RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
         AS n_within_5
FROM lineitem
""",
    section="B.5",
    notes="value-bounded RANGE frame. SCALE WARNING — partitioned on "
    "3-value l_returnflag, one ~N/3-row sorted task per value at "
    "scale; the 100 TB form of a trailing-range count is a binned "
    "aggregation (floor(l_quantity) group-by + bounded self-join over "
    "adjacent bins, see join_range_binned) rather than a per-row "
    "window over a tiny-cardinality partition key",
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range frames bound by VALUE, so the count is tie-insensitive.
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_quantity")
        .rangeBetween(-5, Window.currentRow)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_quantity",
        F.count("*").over(w).alias("n_within_5"),
    )


@query(
    "win_dedup_rank",
    oracle="""
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
), keyed AS (
  SELECT *, concat_ws(':', coalesce(cast(event_id AS varchar), ''),
                           coalesce(cast(user_id AS varchar), '')) AS k
  FROM doubled
)
SELECT event_id, ts, user_id, event_type, value FROM (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY ts, event_id) rn
  FROM keyed) WHERE rn = 1
""",
    section="B.5",
)
def win_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The oracle twin of the reference's stateful dedup (A6): exactly
    # the formulation FIXTURES.md prescribes.
    ev = load(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)
    keyed = doubled.withColumn("k", dedup_key(["event_id", "user_id"]))
    return dedup_rank(keyed, ["k"], ["ts", "event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "win_running_distinct",
    oracle="""
WITH flagged AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN row_number() OVER (
                PARTITION BY user_id, event_type
                ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, ts,
       cast(sum(first_seen) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS bigint)
         AS distinct_types_so_far
FROM flagged
""",
    section="C",
    notes="running COUNT(DISTINCT) over time — not directly a window "
    "function in any engine (distinct frames need full-frame state). "
    "The scalable rewrite: flag each (user, value)'s FIRST occurrence "
    "with one ranked window, then a running sum of flags gives the "
    "distinct count at every row. ONE shuffle: an explicit "
    "repartition on user_id satisfies BOTH window clusterings "
    "(hash(user_id) is a subset of (user_id, event_type), so rows of "
    "one (user, type) group are already colocated) — window order "
    "alone would shuffle twice, hash(user_id, event_type) does not "
    "satisfy the second window. Plan-tested. State per row is one "
    "bit, not a distinct set. 'How many distinct error kinds had "
    "this pod emitted by time t' over the reference's event stream",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").repartition("user_id")
    first_seen = (
        F.row_number().over(
            Window.partitionBy("user_id", "event_type").orderBy(
                "ts", "event_id"
            )
        )
        == 1
    ).cast("int")
    flagged = e.select(
        "event_id", "user_id", "ts", first_seen.alias("first_seen")
    )
    running = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("first_seen").over(running).alias("distinct_types_so_far"),
    )


@query(
    "win_distribution",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       ntile(10) OVER w AS decile
FROM orders
WINDOW w AS (PARTITION BY o_orderpriority
             ORDER BY o_totalprice, o_orderkey)
""",
    section="B.5",
    notes="distribution window functions: percent_rank / cume_dist / "
    "ntile over a tie-broken ordering. The ratios are exact rationals "
    "evaluated in double -- identical on both engines; round(6) "
    "guards the hash anyway. SCALE WARNING -- partitioned on 5-value "
    "o_orderpriority (~N/5-row single-task sorts at 100 TB); the "
    "scale form of a global rank-ratio is approx_percentile "
    "cutpoint assignment (see agg_hist_equi_depth_approx / "
    "llm_ccnet_buckets_approx), not a per-row distribution window",
)
def win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "win_time_range",
    oracle="""
SELECT event_id, user_id, ts,
       cast(sum(cast(round(value * 100) AS bigint)) OVER
         (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS double)
         / 100.0 AS trailing_24h_sum,
       cast(count(*) OVER
         (PARTITION BY user_id ORDER BY epoch_us(ts)
          RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW) AS bigint)
         AS trailing_24h_n
FROM events
""",
    section="B.5",
    notes="event-TIME range frame: per-user trailing-24h rolling sum/"
    "count ordered by epoch-micros (numeric range bounds evaluate "
    "identically on both engines; interval bounds would too but only "
    "DuckDB accepts them over timestamps directly). The rolling sum "
    "uses the scaled-int discipline so frame-merge order cannot "
    "perturb the double. One shuffle on user_id",
)
def win_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (
            F.sum(F.round(F.col("value") * 100).cast("bigint")).over(w)
            .cast("double")
            / 100.0
        ).alias("trailing_24h_sum"),
        F.count("*").over(w).cast("bigint").alias("trailing_24h_n"),
    )


@query(
    "win_ignore_nulls",
    oracle="""
WITH sparse AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN value END AS pv
  FROM events
)
SELECT user_id, event_id,
       last_value(pv IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_purchase_value,
       lead(pv, 1 IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS next_purchase_value
FROM sparse
""",
    section="C",
    notes="native IGNORE NULLS window surface (last_value / lead): "
    "carry the most recent purchase value forward and peek at the "
    "next one, per user -- the direct form of the LOCF trick "
    "ts_fill_forward builds portably from count-group windows. One "
    "shuffle serves both directions; ordering tie-broken by the "
    "unique event_id",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sparse = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pv"),
    )
    # PySpark's F.lead has no ignoreNulls parameter -- the SQL window
    # syntax is the public surface for it (same text as the oracle)
    return sparse.selectExpr(
        "user_id",
        "event_id",
        """last_value(pv) IGNORE NULLS OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS last_purchase_value""",
        """lead(pv, 1) IGNORE NULLS OVER (
             PARTITION BY user_id ORDER BY ts, event_id)
             AS next_purchase_value""",
    )


@query(
    "win_nth_value",
    oracle="""
SELECT user_id, event_id,
       nth_value(value, 3) OVER w AS third_value,
       nth_value(CASE WHEN event_type = 'purchase' THEN value END,
                 2 IGNORE NULLS) OVER w AS second_purchase_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
    section="B.5",
    notes="nth_value over the full partition frame, respect- and "
    "ignore-nulls variants ('the user's 3rd event value' / 'their "
    "2nd purchase value' — positional lookups session analytics "
    "ask for; DuckDB spells the modifier INSIDE the call — "
    "nth_value(x, n IGNORE NULLS)). The explicit unbounded-both-ways "
    "frame matters: the "
    "default running frame would make nth_value row-dependent. Tie "
    "broken to uniqueness by (ts, event_id); one shuffle",
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        F.nth_value("value", 3).over(w).alias("third_value"),
        F.nth_value(purchase_val, 2, ignoreNulls=True)
        .over(w)
        .alias("second_purchase_value"),
    )
