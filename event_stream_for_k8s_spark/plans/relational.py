"""Batch relational core — SURVEY.md §2 B.2 (project/filter), B.4
(aggregation), B.6 (sort/limit/topk), B.7 (set ops).

Every query here is Catalyst-native (no UDFs): projections and filters
reach the parquet scan (pushdown + pruning), aggregations get map-side
partial aggregation automatically, top-k plans as TakeOrderedAndProject.
Scale notes sit on the queries where the plan choice matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.caching import query_persist

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.operators import dedup_key, top_k, top_k_per_group
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.plans.util import davg, dsum, sql_davg, sql_dsum

# --------------------------------------------------------------------------
# B.2 — projection / filter / predicates
# --------------------------------------------------------------------------


@query(
    "project_select",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
FROM lineitem
""",
    section="B.2",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # Per-row double arithmetic is order-independent => exact oracle match.
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        (
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("charged"),
    )


@query(
    "project_nested",
    oracle="""
SELECT event_id, coalesce(event_type, '-') AS etype, user_id AS uid
FROM events
""",
    section="B.2",
)
def project_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Pack into a struct, then extract dotted fields with null defaults —
    # the reference's metric-label projection (tasks.rs:109-121).
    nested = ev.select(
        "event_id", F.struct("event_type", "user_id").alias("meta")
    )
    return nested.select(
        "event_id",
        F.coalesce(F.col("meta.event_type"), F.lit("-")).alias("etype"),
        F.col("meta.user_id").alias("uid"),
    )


@query(
    "project_envelope",
    oracle="""
SELECT ts AS time, event_id AS eid, event_type AS etype, value AS val
FROM events
""",
    section="B.2",
)
def project_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # The reference's KubernetesEvent envelope (types.rs:10-18): canonical
    # time + the whole row nested one level down.
    env = ev.select(
        F.col("ts").alias("time"), F.struct(*ev.columns).alias("kubernetes_event")
    )
    return env.select(
        "time",
        F.col("kubernetes_event.event_id").alias("eid"),
        F.col("kubernetes_event.event_type").alias("etype"),
        F.col("kubernetes_event.value").alias("val"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 1000 AND 150000
  AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
  AND o_custkey IS NOT NULL
  AND NOT (o_orderkey % 10 = 3)
""",
    section="B.2",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 150000)
        & (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"))
        & F.col("o_custkey").isNotNull()
        & ~(F.col("o_orderkey") % 10 == 3)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_ttl",
    oracle="""
SELECT event_id, ts, event_type FROM events
WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
""",
    section="B.2",
)
def filter_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A12 TTL-age predicate as a query (tasks.rs:196) — event-time cutoff.
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("ts") >= F.lit("2024-01-20 00:00:00").cast("timestamp")).select(
        "event_id", "ts", "event_type"
    )


@query(
    "key_concat",
    oracle="""
SELECT event_id,
       concat_ws(':', coalesce(cast(event_id AS varchar), ''),
                      coalesce(event_type, '')) AS dedup_key
FROM events
""",
    section="B.2",
)
def key_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", dedup_key(["event_id", "event_type"]).alias("dedup_key")
    )


# --------------------------------------------------------------------------
# B.4 — aggregations
# --------------------------------------------------------------------------


@query(
    "agg_hash",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty,
       {sql_dsum('l_extendedprice')} AS sum_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {sql_davg('l_quantity')} AS avg_qty,
       min(l_quantity) AS min_qty,
       max(l_extendedprice) AS max_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    section="B.4",
)
def agg_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # TPC-H Q1 shape. Partial (map-side) + final aggregation is automatic;
    # at 100 TB this is one shuffle of a handful of groups.
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4).alias(
            "sum_disc_price"
        ),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "agg_multidim",
    oracle=f"""
SELECT coalesce(event_type, '-') AS etype,
       user_id % 10 AS ubucket,
       strftime(ts, '%Y-%m') AS month,
       try_cast(json_extract_string(nullif(props, ''), '$.k') AS int) % 5
         AS kbucket,
       count(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3, 4
""",
    section="B.4",
)
def agg_multidim(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's 4-dim Prometheus counter key (tasks.rs:26-37) with
    # '-' null defaults, as a relational aggregation.
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.coalesce("event_type", F.lit("-")).alias("etype"),
        (F.col("user_id") % 10).alias("ubucket"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        # try_cast: a non-numeric $.k (props format is a data property)
        # buckets as NULL on both engines instead of an ANSI cast crash
        (
            F.get_json_object("props", "$.k").try_cast("int") % 5
        ).alias("kbucket"),
    ).agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))


@query(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION form of agg_approx_distinct: HLL++ only, no exact
    shuffle of keys — the 100 TB count-distinct path. The registered
    query wraps this in an exact+error-envelope harness so the driver
    can hash-check it; a real deployment runs THIS and drops the
    exact columns."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT l_returnflag,
       cast(count(DISTINCT l_partkey) AS bigint) AS exact_parts,
       count(*) AS n_rows,
       TRUE AS within_bound
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
    notes="HLL++ sketch with an exact+error-envelope oracle (VERDICT "
    "r07 #1): the output carries the EXACT count and a boolean "
    "asserting |approx-exact| <= 10% (5x the rsd=0.02 target; HLL++ "
    "is deterministic for fixed data, so the boolean is stable and "
    "hash-checkable — the approx VALUE itself stays out of the "
    "output). The bound has an absolute floor of 1 (the "
    "agg_hll_sketch pattern, ADVICE r08): a group with a tiny exact "
    "distinct count must not flip the boolean on a +-1 sketch "
    "deviation after a fixture regeneration. The exact-count pass "
    "exists for the gate only; "
    "approx_distinct_sketch above is the production form. "
    "agg_approx_distinct_exact remains the stronger small-domain "
    "anchor; tests assert the 5% envelope on the raw sketch.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    approx = approx_distinct_sketch(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts")
    )
    return approx.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        "n_rows",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.greatest(F.lit(1.0), 0.10 * F.col("exact_parts"))
        ).alias("within_bound"),
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       count(*) AS n_rows,
       {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
""",
    section="B.4",
    notes="empty-input fine print: on a ZERO-ROW table Spark's "
    "rollup/cube emit no rows while DuckDB (per the SQL standard) "
    "still emits the grand-total () grouping-set row with count 0 — "
    "a documented engine divergence, exercised crash-free by "
    "tests/test_empty_inputs.py",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
    ).select("l_returnflag", "l_linestatus", "gid", "n_rows", "sum_qty")


@query(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n_orders,
       {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
""",
    section="B.4",
    notes="empty-input fine print: see agg_rollup — Spark emits no "
    "rows on a zero-row table where the standard (and DuckDB) keep "
    "the grand-total row",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")


@query(
    "agg_gsets",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    section="B.4",
)
def agg_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(F.grouping_id().alias("gid"), F.count("*").alias("n_orders"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders")
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey, count(*) AS n_orders, {sql_dsum('o_totalprice')} AS sum_price
FROM orders
GROUP BY o_custkey
HAVING count(*) >= 12
""",
    section="B.4",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("sum_price"))
        .filter(F.col("n_orders") >= 12)
    )


@query(
    "agg_stats",
    oracle="""
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS std_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
    notes="stat aggregates rounded to 6dp: merge order differs across "
    "engines at ~1e-12 relative error",
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.expr("percentile(l_quantity, 0.5D)"), 6).alias("median_qty"),
    )


@query(
    "agg_collect",
    oracle="""
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
       count(*) AS n_orders
FROM orders WHERE o_custkey < 50
GROUP BY o_custkey
""",
    section="B.4",
    notes="collect_list output serialized via array_join — the driver's "
    "hasher requires scalar cells",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # array_sort makes collect_list deterministic (SURVEY.md §5.2).
    return (
        o.filter(F.col("o_custkey") < 50)
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("o_orderkey")).cast(
                    "array<string>"
                ),
                ",",
            ).alias("orderkeys"),
            F.count("*").alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# B.6 — sort / limit / top-k
# --------------------------------------------------------------------------


@query(
    "sort_global",
    oracle="""
SELECT c_custkey, c_name, seg, pos FROM (
  SELECT c_custkey, c_name, nullif(c_mktsegment, 'BUILDING') AS seg,
         row_number() OVER (
           ORDER BY nullif(c_mktsegment, 'BUILDING') ASC NULLS LAST,
                    c_acctbal DESC, c_custkey) AS pos
  FROM customer)
""",
    section="B.6",
    notes="order encoded as a materialized position column because the "
    "driver's value hash is order-insensitive",
)
def sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    w = Window.orderBy(
        seg.asc_nulls_last(), F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_custkey",
            "c_name",
            seg.alias("seg"),
            F.row_number().over(w).alias("pos"),
        )
        .orderBy("pos")
    )


@query(
    "limit_n",
    oracle="SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 100",
    section="B.6",
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").limit(100)


@query(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""",
    section="B.6",
)
def topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plans as TakeOrderedAndProject: per-partition heaps, no full sort —
    # already the right 100 TB strategy.
    o = load(spark, sf_dir, "orders")
    return top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        25,
    )


@query(
    "topk_per_group",
    oracle="""
SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
  FROM customer) WHERE rnk <= 3
""",
    section="B.6",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return top_k_per_group(
        c.select("c_mktsegment", "c_custkey", "c_acctbal"),
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        3,
    )


# --------------------------------------------------------------------------
# B.7 — set operations
# --------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority LIKE '1%'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 100000
""",
    section="B.7",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    a = o.filter(F.col("o_orderpriority").like("1%"))
    b = o.filter(F.col("o_totalprice") > 100000)
    return a.select("o_orderkey", "o_orderpriority").unionByName(
        b.select("o_orderkey", "o_orderpriority")
    )


@query(
    "set_union",
    oracle="""
SELECT c_nationkey AS nk FROM customer
UNION
SELECT s_nationkey AS nk FROM supplier
""",
    section="B.7",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
SELECT c_custkey AS k FROM customer
INTERSECT
SELECT o_custkey AS k FROM orders
""",
    section="B.7",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return c.intersect(o)


@query(
    "set_except",
    oracle="""
SELECT k FROM (
  SELECT c_custkey AS k FROM customer
  UNION ALL
  SELECT -c_custkey AS k FROM customer
  WHERE c_custkey % 100 = 0 AND c_custkey > 0
)
EXCEPT
SELECT o_custkey AS k FROM orders
""",
    section="B.7",
    notes="customers that never ordered, phrased as a set difference "
    "(the reference's A6 dedup probe). The synthetic fixture has "
    "every customer ordering at every SF, which made this a 0=0 "
    "attestation (VERDICT r12 'what's wrong' #3: a 0-row match "
    "cannot catch a value bug) — so the left side plants negated "
    "sentinel keys (every 100th customer) that provably survive the "
    "difference on BOTH engines; genuine orderless customers would "
    "surface alongside them",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    left = c.select(F.col("c_custkey").alias("k")).unionAll(
        c.filter(
            (F.col("c_custkey") % 100 == 0) & (F.col("c_custkey") > 0)
        ).select((-F.col("c_custkey")).alias("k"))
    )
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    # left keys are unique by construction (distinct customers plus
    # disjoint negated sentinels), so EXCEPT == exceptAll here
    return left.exceptAll(o.distinct())


@query(
    "agg_skew_salted",
    oracle="""
SELECT event_type, cast(count(*) AS bigint) AS n FROM events GROUP BY event_type
""",
    section="B.4",
    notes="two-phase salted aggregation (operators/skew.py): identical "
    "result to agg-by-key, but a pathologically hot key fans out over "
    "16 reducers in phase 1 — the explicit fallback when AQE skew "
    "handling is not enough",
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.operators.skew import salted_count

    ev = load(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"], entropy_col="event_id", n=16)


# --------------------------------------------------------------------------
# Showcase: TPC-H-style multi-join analytical pipelines (join order +
# broadcast selection left entirely to Catalyst/AQE)
# --------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 0)} AS sum_qty,
       {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
         AS sum_charge,
       {sql_davg('l_quantity', 0)} AS avg_qty,
       {sql_davg('l_extendedprice', 2)} AS avg_price,
       {sql_davg('l_discount', 2)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    section="B.4",
    notes="TPC-H Q1 (pricing summary report): the canonical wide "
    "aggregate — 8 aggregates over a filtered fact scan, 2 grouping "
    "keys of tiny cardinality, pure map-side partials. All money "
    "sums use the scaled-int discipline (products of 2dp columns "
    "carry 4 and 6 decimal digits exactly), so the report "
    "hash-matches a single-threaded engine at any parallelism",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", dec=0).alias("sum_qty"),
        dsum("l_extendedprice", dec=2).alias("sum_base_price"),
        dsum(disc_price, dec=4).alias("sum_disc_price"),
        dsum(charge, dec=6).alias("sum_charge"),
        davg("l_quantity", dec=0).alias("avg_qty"),
        davg("l_extendedprice", dec=2).alias("avg_price"),
        davg("l_discount", dec=2).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
    section="B.4",
    notes="TPC-H Q6 (forecasting revenue change): the pure "
    "filter-and-sum scan — every predicate pushes to the parquet "
    "reader and the single global sum is one map-side partial per "
    "file split plus a 1-row merge; the query that measures scan "
    "throughput and pushdown, nothing else",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * F.col("l_discount"), dec=4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
SELECT o.o_orderpriority, cast(count(*) AS bigint) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o.o_orderpriority
""",
    section="B.3/B.4",
    notes="TPC-H Q4 (order priority checking): the correlated EXISTS "
    "is a LEFT SEMI join on orderkey with the correlated predicate "
    "as join condition — the lineitem side never materializes "
    "payload columns and duplicate matches never multiply rows. "
    "Complements Q18's IN-subquery (pre-aggregated semi-join) as the "
    "second decorrelation shape",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("bigint").alias("order_count"))
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY n1.n_name, n2.n_name
""",
    section="B.3/B.4",
    notes="TPC-H Q7 (volume shipping between two nations; synthetic "
    "nation names NATION_3/NATION_7 stand in for FRANCE/GERMANY): the "
    "fact spine shuffles on its keys, BOTH nation legs broadcast, "
    "and the bi-directional nation pair disjunction filters after "
    "the broadcast joins — no OR-join on the spine",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair_ok)
        .groupBy("supp_nation", "cust_nation")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT n2.n_name AS supp_nation,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
  JOIN region r   ON n1.n_regionkey = r.r_regionkey
  JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'EUROPE' AND p.p_type = 'ECONOMY'
)
SELECT round(
  ({sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END", 4)})
  / ({sql_dsum('volume', 4)}), 6) AS mkt_share
FROM all_nations
""",
    section="B.3/B.4",
    notes="TPC-H Q8 (national market share): seven-table star — part "
    "filter prunes the fact spine early via broadcast, both nation "
    "legs and region broadcast, and the share is a conditional "
    "scaled-int sum over the already-filtered volume set divided by "
    "its total (one pass, one exact double division)",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n_cust = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi"
    ).select(F.col("n_nationkey").alias("c_nk"))
    n_supp = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fr = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nk"), "left_semi")
        .join(F.broadcast(load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nk"))
        .agg(
            F.round(dsum(fr, dec=4) / dsum(vol, dec=4), 6).alias(
                "mkt_share"
            )
        )
    )


@query(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l.l_linestatus,
       cast(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS high_line_count,
       cast(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS bigint) AS low_line_count
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
""",
    section="B.3/B.4",
    notes="TPC-H Q12 shape (priority mix per line status; the ship"
    "mode column is not in the synthetic schema, l_linestatus stands "
    "in): fact-fact equi-join with the date filter pushed to the "
    "lineitem scan, conditional counts as one pass",
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT round(
    100.0 * ({sql_dsum("CASE WHEN p.p_type LIKE 'PROMO%' THEN "
                       "l.l_extendedprice * (1 - l.l_discount) "
                       "ELSE 0 END", 4)})
          / ({sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)}), 6)
  AS promo_revenue_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
    section="B.3/B.4",
    notes="TPC-H Q14 (promo revenue share; the synthetic part table "
    "has a real PROMO p_type): broadcast dim join + two scaled-int "
    "sums in one pass; the final ratio is one double division of two "
    "exact values, identical everywhere",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * dsum(promo, dec=4) / dsum(rev, dec=4), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(cast(round(l_quantity) AS bigint)) > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       cast(sum(cast(round(l.l_quantity) AS bigint)) AS bigint) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
""",
    section="B.3/B.4",
    notes="TPC-H Q18 (large-volume customers): the HAVING subquery "
    "becomes a semi-join on the pre-aggregated order keys — the "
    "filter aggregate runs over (orderkey, qty) pairs only, and the "
    "big join only materializes rows for qualifying orders. "
    "Quantities are integral in the synthetic data, so int sums "
    "hash-match exactly",
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = F.round("l_quantity").cast("bigint")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"),
                F.col("l_orderkey") == F.col("bk"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(qty).cast("bigint").alias("total_qty"))
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
""",
    section="B.3/B.4",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    section="B.3/B.4",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 6-way star join: the three dimension legs broadcast, the
    # customer-orders-lineitem spine shuffles on its keys once each —
    # exactly the plan AQE picks without hints.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
""",
    section="B.3/B.4",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


# --------------------------------------------------------------------------
# B.4 extensions — pivot / unpivot / SQL subquery surface
# --------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "agg_pivot",
    oracle="SELECT user_id, "
    + ", ".join(
        f"{sql_dsum(f'CASE WHEN event_type = {t!r} THEN value END')}"
        f" AS sum_{t}"
        for t in EVENT_TYPES
    )
    + " FROM events GROUP BY user_id",
    section="B.4",
    notes="pivot with an EXPLICIT value list: without it Spark runs an "
    "extra distinct-scan to discover columns — never acceptable on a "
    "100 TB fact table; with it the plan is one ordinary hash agg",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(dsum("value"))
    )
    return out.select(
        "user_id",
        *[F.col(t).alias(f"sum_{t}") for t in EVENT_TYPES],
    )


@query(
    "agg_unpivot",
    oracle="""
SELECT o_orderkey, metric, val FROM (
  SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey' AS metric, cast(o_custkey AS double) AS val
  FROM orders
) WHERE val IS NOT NULL
""",
    section="B.4",
    notes="unpivot/melt (wide->long): Spark's native unpivot is a "
    "zero-shuffle generator expression, not a join",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).unpivot(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


SQL_CTE_TEXT = """
WITH big_spenders AS (
  SELECT o_custkey, count(*) AS n_orders
  FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, b.n_orders
FROM customer c JOIN big_spenders b ON c.c_custkey = b.o_custkey
WHERE c.c_acctbal > (
    SELECT cast(sum(cast(round(c_acctbal * 100) AS bigint)) AS double)
           / (100.0 * count(*))
    FROM customer)
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderpriority = '1-URGENT')
"""


@query(
    "sql_cte_subquery",
    oracle=SQL_CTE_TEXT,
    section="B.4",
    notes="the SQL surface: CTE + uncorrelated scalar subquery + "
    "correlated EXISTS, ONE query text executed verbatim by both "
    "engines (spark.sql over temp views vs DuckDB). Catalyst plans "
    "EXISTS as a left-semi join and the scalar subquery as a "
    "broadcast — no per-row re-execution",
)
def sql_cte_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(SQL_CTE_TEXT)


def hll_sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION form of agg_hll_sketch: Datasketches HLL per-group
    sketches + hll_union_agg re-aggregation. Unlike
    approx_count_distinct the sketch itself is storable/mergeable —
    counts roll up across days/partitions without re-scanning raw
    data, the 100 TB distinct-count pattern. The registered query
    wraps this in an exact+envelope harness; a deployment runs THIS
    (and stores the sketches, not the estimates)."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    rollup = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).select(F.lit("__all__").alias("event_type"), "est")
    return per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est")
    ).unionByName(rollup)


@query(
    "agg_hll_sketch",
    oracle="""
SELECT event_type, cast(nd AS bigint) AS exact_users, TRUE AS within_bound
FROM (
  SELECT event_type, count(DISTINCT user_id) AS nd
  FROM events GROUP BY event_type
  UNION ALL
  SELECT '__all__' AS event_type, count(DISTINCT user_id) AS nd
  FROM events
)
""",
    section="B.4",
    notes="Datasketches HLL with an exact+error-envelope oracle "
    "(VERDICT r07 #1): output carries the EXACT distinct count and a "
    "boolean asserting the sketch estimate (including the mergeability "
    "path — the __all__ row estimates a hll_union_agg of the per-type "
    "sketches) lands within max(1, 10%) of it; deterministic for "
    "fixed data, so hash-checkable, estimate value not in the output. "
    "hll_sketch_estimates above is the production form; tests assert "
    "the tighter 5% envelope on the raw estimates.",
)
def agg_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    est = hll_sketch_estimates(spark, sf_dir)
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    overall = ev.agg(
        F.countDistinct("user_id").alias("exact_users")
    ).select(F.lit("__all__").alias("event_type"), "exact_users")
    exact = per_type.unionByName(overall)
    return est.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users"))
            <= F.greatest(F.lit(1.0), 0.10 * F.col("exact_users"))
        ).alias("within_bound"),
    )


@query(
    "sql_lateral",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
""",
    section="B.7",
    notes="correlated LATERAL subquery (top-2 customers per nation): "
    "ONE SQL text runs verbatim on both engines. Catalyst rewrites "
    "the correlated limit into a ranked window under the hood -- "
    "same plan topk_per_group hand-writes",
)
def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""
    )


@query(
    "agg_bool",
    oracle="""
SELECT o_orderpriority,
       bool_and(o_totalprice > 1000) AS all_over_1k,
       bool_or(o_orderstatus = 'F') AS any_finished,
       cast(count_if(o_totalprice > 100000) AS bigint) AS n_big,
       cast(count_if(o_orderstatus = 'O') AS bigint) AS n_open
FROM orders GROUP BY o_orderpriority
""",
    section="B.4",
    notes="boolean aggregate family: bool_and / bool_or / count_if "
    "(every / any / conditional count). Map-side combinable like any "
    "hash agg",
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("any_finished"),
        F.count_if(F.col("o_totalprice") > 100000)
        .cast("bigint")
        .alias("n_big"),
        F.count_if(F.col("o_orderstatus") == "O")
        .cast("bigint")
        .alias("n_open"),
    )


@query(
    "sample_stratified",
    oracle="""
WITH ranked AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         row_number() OVER (
           PARTITION BY l_returnflag
           ORDER BY md5(cast(l_orderkey AS varchar) || ':' ||
                        cast(l_linenumber AS varchar)),
                    l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n_stratum
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       cast(n_stratum AS bigint) AS n_stratum
FROM ranked
WHERE rn <= ceil(0.1 * n_stratum)
""",
    section="B.4",
    notes="deterministic 10% stratified sample: rank rows inside each "
    "stratum by a content hash (not rand() -- the same rows are "
    "sampled on every rebuild) and keep the top decile. EXACT "
    "per-stratum rate, unlike Bernoulli sampleBy which only hits the "
    "rate in expectation. One shuffle on the stratum key. SCALE "
    "WARNING -- the stratum key l_returnflag has 3 values, so each "
    "rank sorts ~N/3 rows in one task; at 100 TB either sampleBy "
    "(Bernoulli, no shuffle) or rank on bucketed hash prefixes "
    "(hash-range split per stratum, merge counts) replaces the "
    "single-task per-stratum sort",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    h = F.md5(
        F.concat_ws(
            ":",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        )
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        h, "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).cast("bigint").alias("n_stratum"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(0.1 * F.col("n_stratum"))
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "n_stratum")


@query(
    "sample_reservoir",
    oracle="""
WITH ranked AS (
  SELECT o_orderkey, o_orderpriority,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY md5(cast(o_orderkey AS varchar)), o_orderkey) AS rn
  FROM orders
)
SELECT o_orderkey, o_orderpriority, rn FROM ranked WHERE rn <= 20
""",
    section="B.4",
    notes="deterministic fixed-k (k=20) per-group sample -- the "
    "reservoir-sample shape (fixed quota per group, content-hash "
    "order so every rebuild samples the same rows), implemented as "
    "the TWO-PHASE rank sample_stratified's SCALE WARNING prescribes: "
    "phase 1 ranks inside (group, hash-bucket%32) and keeps k per "
    "bucket (32 parallel tasks per group, each sorting ~N/(|G|*32) "
    "rows), phase 2 ranks the <= 32*k survivors per group -- a "
    "provable superset of the global hash-order top-k, so the result "
    "is IDENTICAL to the single-window form the oracle spells out "
    "while no task ever sorts a whole group. The low-cardinality "
    "group key (5 priorities) is exactly the case the bucketing "
    "exists for",
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(32)
    )
    w1 = Window.partitionBy("o_orderpriority", "bkt").orderBy(
        "h", "o_orderkey"
    )
    cand = (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            h.alias("h"),
            bucket.alias("bkt"),
        )
        .withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= 20)
    )
    w2 = Window.partitionBy("o_orderpriority").orderBy("h", "o_orderkey")
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 20)
        .select("o_orderkey", "o_orderpriority", "rn")
    )


@query(
    "agg_argminmax",
    oracle="""
SELECT o_orderpriority,
       max_by(o_orderkey, o_totalprice + o_orderkey * 1e-9)
         AS biggest_order,
       min_by(o_orderkey, o_totalprice + o_orderkey * 1e-9)
         AS smallest_order,
       max(o_totalprice) AS max_price
FROM orders GROUP BY o_orderpriority
""",
    section="B.4",
    notes="argmin/argmax aggregates (max_by/min_by): 'which row holds "
    "the extreme' without a join-back or window. The ordering value "
    "is made UNIQUE (price + orderkey*1e-9) because both engines "
    "break max_by ties arbitrarily -- same discipline as window "
    "orderings. Single map-side-combinable agg",
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ordv = F.col("o_totalprice") + F.col("o_orderkey") * 1e-9
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ordv).alias("biggest_order"),
        F.min_by("o_orderkey", ordv).alias("smallest_order"),
        F.max("o_totalprice").alias("max_price"),
    )


@query(
    "agg_mode",
    oracle="""
WITH counted AS (
  SELECT l_returnflag, l_quantity, count(*) AS n
  FROM lineitem GROUP BY 1, 2
), ranked AS (
  SELECT l_returnflag, l_quantity, n,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, l_quantity) AS rn
  FROM counted
)
SELECT l_returnflag, l_quantity AS mode_qty, n AS mode_count
FROM ranked WHERE rn = 1
""",
    section="B.4",
    notes="deterministic mode: count-then-rank with a value tie-break "
    "instead of the builtin mode() (both engines break frequency ties "
    "arbitrarily). Two-level aggregation -- the heavy first level is "
    "map-side combined; the rank runs on |groups| x |distinct values| "
    "rows only",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    counted = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), "l_quantity"
    )
    return (
        counted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("l_quantity").alias("mode_qty"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "agg_linreg",
    oracle="""
SELECT l_returnflag,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
       cast(regr_count(l_extendedprice, l_quantity) AS bigint) AS n
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
    notes="linear-regression aggregates (price-on-quantity per flag): "
    "regr_slope / intercept / r2 / count. Rounded to 6dp -- the "
    "covariance accumulators merge in different orders across "
    "engines. Single map-side-combinable agg, like corr in agg_stats",
)
def agg_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope"
        ),
        F.round(
            F.regr_intercept("l_extendedprice", "l_quantity"), 6
        ).alias("intercept"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.regr_count("l_extendedprice", "l_quantity")
        .cast("bigint")
        .alias("n"),
    )


@query(
    "agg_percentile_multi",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
""",
    section="B.4",
    notes="multi-percentile in ONE aggregation pass (percentile(value, "
    "array(...)) sorts once for all three ranks; three separate "
    "percentile aggs would sort three times), then unpacked to "
    "scalar p50/p90/p99 columns because the driver's hasher cannot "
    "take list cells. Exact interpolated percentiles match across "
    "engines after round(6). The 100 TB twin is approx_percentile "
    "with an accuracy knob (single-pass sketch, no sort)",
)
def agg_percentile_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    pcts = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return e.groupBy("event_type").agg(
        F.round(F.get(pcts, 0), 6).alias("p50"),
        F.round(F.get(pcts, 1), 6).alias("p90"),
        F.round(F.get(pcts, 2), 6).alias("p99"),
    )


AGG_FILTER_SQL = """
SELECT event_type,
       count(*) AS n_all,
       count(*) FILTER (WHERE value > 100) AS n_big,
       cast(sum(cast(round(value * 100) AS bigint))
            FILTER (WHERE user_id % 2 = 0) AS double) / 100.0
         AS sum_even_users,
       count(DISTINCT user_id) FILTER (WHERE event_type <> 'error')
         AS n_users_nonerr
FROM events
GROUP BY event_type
"""


@query(
    "agg_filter_clause",
    oracle=AGG_FILTER_SQL,
    section="B.4",
    notes="SQL:2003 aggregate FILTER clauses -- several differently-"
    "filtered aggregates in ONE pass over the data (the alternative "
    "is N scans or N CASE-WHEN pyramids). One SQL text runs verbatim "
    "on both engines; sums use the scaled-int discipline inline",
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(AGG_FILTER_SQL)


def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION form of agg_approx_percentile: single-pass GK
    sketch percentiles (accuracy 10000) — the 100 TB twin of
    agg_percentile_multi: no per-group sort, mergeable partial state.
    The registered query wraps this in a rank-error-envelope harness
    for the driver's hash check; a deployment runs THIS."""
    e = load(spark, sf_dir, "events")
    # ONE sketch per group, unpacked to scalar columns.
    pcts = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    return e.groupBy("event_type").agg(
        F.get(pcts, 0).alias("p50"),
        F.get(pcts, 1).alias("p90"),
        F.get(pcts, 2).alias("p99"),
        F.count("*").alias("n"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
SELECT event_type, count(*) AS n,
       TRUE AS within_p50, TRUE AS within_p90, TRUE AS within_p99
FROM events GROUP BY event_type
""",
    section="B.4",
    notes="GK sketch percentiles with a rank-error-envelope oracle "
    "(VERDICT r07 #1): the sketch value's observed rank (count of "
    "rows <= it, via one broadcast join of the tiny per-group sketch "
    "row back over the table) must sit within 1% of the requested "
    "percentile — 100x the accuracy=10000 theoretical bound, so the "
    "boolean is deterministically TRUE for fixed data and "
    "hash-checkable, while the sketch VALUE (engine-specific) stays "
    "out of the output. No value-space comparison, so no float "
    "discipline needed. approx_percentile_sketch above is the "
    "production form; agg_approx_percentile_exact remains the "
    "plateau-domain anchor; tests assert the raw envelope.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = approx_percentile_sketch(spark, sf_dir)
    e = load(spark, sf_dir, "events")
    sums = []
    for tag, pcol in (("50", "p50"), ("90", "p90"), ("99", "p99")):
        sums.append(
            F.sum((F.col("value") <= F.col(pcol)).cast("long")).alias(
                f"le{tag}"
            )
        )
        sums.append(
            F.sum((F.col("value") < F.col(pcol)).cast("long")).alias(
                f"lt{tag}"
            )
        )
    ranks = (
        e.join(F.broadcast(sk), "event_type")
        .groupBy("event_type")
        .agg(
            *sums,
            # rank denominator: NON-NULL values only (the sketch
            # ignores NULLs, so must the observed-rank fraction)
            F.count("value").alias("n_vals"),
            F.first("n").alias("n"),
        )
    )

    def ok(tag: str, p: float):
        # plateau-aware rank check: the sketch value is a valid
        # p-quantile (up to delta) iff the rank interval its tie
        # plateau occupies, [count(v<a), count(v<=a)]/n, intersects
        # [p-delta, p+delta] — count(v<=a) alone jumps to the TOP of
        # a plateau, failing legitimately on heavily tied degenerate
        # data. delta = 1% + 1/n (GK's own bound is 1e-4 of that
        # budget; 1/n covers discreteness). All-NULL groups have no
        # rank to check: vacuously TRUE, matching the oracle literal.
        delta = F.lit(0.01) + F.try_divide(F.lit(1.0), F.col("n_vals"))
        lo = F.try_divide(F.col(f"lt{tag}"), F.col("n_vals"))
        hi = F.try_divide(F.col(f"le{tag}"), F.col("n_vals"))
        return F.when(F.col("n_vals") == 0, F.lit(True)).otherwise(
            (lo <= F.lit(p) + delta) & (hi >= F.lit(p) - delta)
        )

    return ranks.select(
        "event_type",
        "n",
        ok("50", 0.5).alias("within_p50"),
        ok("90", 0.9).alias("within_p90"),
        ok("99", 0.99).alias("within_p99"),
    )


@query(
    "agg_approx_topk",
    oracle="""
SELECT event_type AS item, count(*) AS est
FROM events GROUP BY event_type
""",
    section="C",
    notes="sketch-based heavy hitters (Spark 4 approx_top_k): one "
    "mergeable fixed-size sketch replaces a full group-by when only "
    "the top few of millions of keys matter -- the 100 TB shape for "
    "'which namespaces are noisiest' over the reference's counter "
    "stream (A8). Checked EXACTLY by pinning the domain: event_type "
    "has fewer distincts than the sketch capacity, where the sketch "
    "degenerates to exact counts (the same exactness-domain trick as "
    "agg_approx_percentile's rank-error envelope, but yielding a "
    "full hash match); on high-cardinality keys it is the rows-only "
    "approximate tier",
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    sk = e.agg(F.expr("approx_top_k(event_type, 10)").alias("tk"))
    return sk.select(F.explode("tk").alias("s")).select(
        F.col("s.item").alias("item"), F.col("s.count").alias("est")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs
FROM orders GROUP BY o_orderstatus
""",
    section="B.4",
    notes="EXACT distinct count via fixed-size bitmaps (Spark 4 "
    "bitmap_* family): stage 1 groups by (key, "
    "bitmap_bucket_number(id)) and ORs ids into a <=4 KB bitmap per "
    "bucket — partial aggregation combines map-side, and per-group "
    "state is bounded regardless of cardinality, unlike "
    "count(DISTINCT) whose expand+exchange keeps every distinct "
    "value; stage 2 sums bitmap_count per key. Same two-level shape "
    "rolls up across days/partitions by bitmap_or_agg on stored "
    "bitmaps without rescanning raw data — the mergeable-but-EXACT "
    "alternative to agg_hll_sketch for dense int keys",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    buckets = o.groupBy(
        "o_orderstatus",
        F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").alias(
            "bm"
        )
    )
    return buckets.groupBy("o_orderstatus").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_custs")
    )


BLOOM_K, BLOOM_M = 4, 4096


@query(
    "join_bloom_membership",
    oracle=f"""
WITH members AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), bits AS (
  SELECT DISTINCT cell.r AS r, cell.b AS b FROM (
    SELECT unnest([{", ".join(
        "{'r': %d, 'b': ('0x' || substr(md5('%d' || c_custkey), 1, 8))::bigint %% %d}"
        % (i, i, BLOOM_M)
        for i in range(BLOOM_K)
    )}]) AS cell
    FROM members
  )
), probes AS (
  SELECT DISTINCT o_custkey AS k FROM orders
), probe_bits AS (
  SELECT k, r, ('0x' || substr(md5(cast(r AS varchar) || k), 1, 8))::bigint
              % {BLOOM_M} AS b
  FROM probes CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS r)
), hits AS (
  SELECT pb.k, count(bits.b) AS n_hit
  FROM probe_bits pb LEFT JOIN bits ON bits.r = pb.r AND bits.b = pb.b
  GROUP BY pb.k
), verdicts AS (
  SELECT h.k, h.n_hit = {BLOOM_K} AS maybe,
         h.k IN (SELECT c_custkey FROM members) AS actual
  FROM hits h
)
SELECT cast(count(*) AS bigint) AS n_probes,
       cast(count(*) FILTER (maybe) AS bigint) AS n_maybe,
       cast(count(*) FILTER (actual) AS bigint) AS n_true,
       cast(count(*) FILTER (maybe AND NOT actual) AS bigint) AS n_false_pos,
       cast(count(*) FILTER (actual AND NOT maybe) AS bigint) AS n_false_neg
FROM verdicts
""",
    section="C",
    notes=f"Bloom-filter membership as pure expressions: the BUILDING-"
    f"segment customer set becomes {BLOOM_K} md5-derived bit positions "
    f"per member (distinct (row, bit) pairs, <= {BLOOM_K}*|S| ints, "
    f"mergeable by union); a probe key is 'maybe present' iff all "
    f"{BLOOM_K} of its bits are set, checked with per-row EQUI-joins. "
    f"This is the semi-join accelerator: ship the filter, not the set "
    f"— Spark's native bloom_filter_agg/might_contain is the "
    f"engine-optimized form (exercised in the runtime-bloom plan "
    f"test); this md5 twin is engine-independent so the oracle checks "
    f"membership EXACTLY, false positives included. n_false_neg is "
    f"structurally zero (Bloom filters never under-claim) and the "
    f"oracle pins that",
)
def join_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    members = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )

    def bloom_bit(key, row):
        r = F.lit(str(row)) if isinstance(row, int) else row.cast("string")
        return (
            F.conv(
                F.substring(F.md5(F.concat(r, key.cast("string"))), 1, 8),
                16,
                10,
            ).cast("bigint")
            % BLOOM_M
        )

    rows_arr = F.array(*[F.lit(i) for i in range(BLOOM_K)])
    # explode the row indices instead of unioning K withColumn branches:
    # a union recomputes the upstream (member filter / probe distinct)
    # once per branch — K extra scans and exchanges for nothing.
    bits = (
        members.select(
            "c_custkey", F.explode(rows_arr).alias("r")
        )
        .select(
            "r", bloom_bit(F.col("c_custkey"), F.col("r")).alias("b")
        )
        .distinct()
    )
    probes = o.select(F.col("o_custkey").alias("k")).distinct()
    probe_bits = probes.select(
        "k", F.explode(rows_arr).alias("r")
    ).select("k", "r", bloom_bit(F.col("k"), F.col("r")).alias("b"))
    hits = (
        probe_bits.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), ["r", "b"], "left"
        )
        .groupBy("k")
        .agg(F.count("hit").alias("n_hit"))
    )
    actual = members.select(
        F.col("c_custkey").alias("k"), F.lit(True).alias("actual")
    )
    verdicts = (
        hits.join(F.broadcast(actual), "k", "left")
        .select(
            "k",
            (F.col("n_hit") == BLOOM_K).alias("maybe"),
            F.coalesce("actual", F.lit(False)).alias("actual"),
        )
    )
    return verdicts.agg(
        F.count("*").alias("n_probes"),
        F.count(F.when(F.col("maybe"), 1)).alias("n_maybe"),
        F.count(F.when(F.col("actual"), 1)).alias("n_true"),
        F.count(F.when(F.col("maybe") & ~F.col("actual"), 1)).alias(
            "n_false_pos"
        ),
        F.count(F.when(F.col("actual") & ~F.col("maybe"), 1)).alias(
            "n_false_neg"
        ),
    )


CM_DEPTH, CM_WIDTH = 4, 64


def _cm_col_spark(key, row):
    """Row-``row`` Count-Min column of ``key``: first 8 md5 hex chars of
    (row || key) as an int, mod width. md5 is identical everywhere, so
    the sketch — including its collisions — reproduces exactly on any
    engine, which is what makes a sketch operator oracle-checkable.
    ``row`` may be a literal int or a Column of row indices."""
    r = F.lit(str(row)) if isinstance(row, int) else row.cast("string")
    return (
        F.conv(F.substring(F.md5(F.concat(r, key)), 1, 8), 16, 10)
        .cast("bigint")
        % CM_WIDTH
    )


def _cm_col_sql(key: str, row: int) -> str:
    return (
        f"('0x' || substr(md5('{row}' || {key}), 1, 8))::bigint % {CM_WIDTH}"
    )


@query(
    "agg_countmin",
    oracle=f"""
WITH cells AS (
  SELECT unnest([{", ".join(
      f"{{'r': {i}, 'c': {_cm_col_sql('event_type', i)}}}"
      for i in range(CM_DEPTH)
  )}]) AS cell
  FROM events
), sketch AS (
  SELECT cell.r AS r, cell.c AS c, count(*) AS n
  FROM cells GROUP BY 1, 2
), keys AS (
  SELECT DISTINCT event_type FROM events
), probes AS (
  SELECT k.event_type, s.n
  FROM keys k JOIN sketch s
    ON {" OR ".join(
        f"(s.r = {i} AND s.c = {_cm_col_sql('k.event_type', i)})"
        for i in range(CM_DEPTH)
    )}
)
SELECT p.event_type, cast(min(p.n) AS bigint) AS est,
       cast((SELECT count(*) FROM events e
             WHERE e.event_type = p.event_type) AS bigint) AS exact
FROM probes p GROUP BY 1
""",
    section="C",
    notes=f"Count-Min sketch frequency estimation, pure expressions: "
    f"each event contributes one increment per row (explode {CM_DEPTH} "
    f"(row, md5-hash mod {CM_WIDTH}) cells, groupBy-count = the "
    f"sketch), a point query takes the MIN over its {CM_DEPTH} "
    f"counters. The sketch is {CM_DEPTH}x{CM_WIDTH} ints TOTAL "
    f"regardless of key cardinality and merges by cell-wise addition "
    f"— the bounded-memory mergeable tier of the reference's label "
    f"counters (A8, tasks.rs:26-45) when the label domain is "
    f"unbounded; over-estimation only, never under. md5-derived hash "
    f"columns make the sketch bit-identical across engines, so the "
    f"oracle checks it EXACTLY, collisions included; the exact column "
    f"pins the overestimate on this domain",
)
def agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cm_col_spark(F.col("event_type"), i).alias("col"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    sketch = (
        e.select(F.explode(cells).alias("cell"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.col").alias("col"))
        .agg(F.count("*").alias("c"))
    )
    keys = e.groupBy("event_type").agg(F.count("*").alias("exact"))
    # each key probes exactly CM_DEPTH cells via EXPLODE of the row
    # indices — a 4-way union of withColumn branches would recompute
    # the keys aggregate once per branch (4 extra scans+exchanges,
    # seen in the plan audit); explode keeps one aggregate, one scan.
    probes = keys.select(
        "*",
        F.explode(F.array(*[F.lit(i) for i in range(CM_DEPTH)])).alias(
            "row"
        ),
    ).withColumn("col", _cm_col_spark(F.col("event_type"), F.col("row")))
    est = (
        probes.join(F.broadcast(sketch), ["row", "col"])
        .groupBy("event_type", "exact")
        .agg(F.min("c").alias("est"))
    )
    return est.select("event_type", "est", "exact")


# --------------------------------------------------------------------------
# Round-3 TPC-H completions (Q13/Q15/Q17/Q19/Q22 need no partsupp;
# column adaptations to the driver's reduced schema are noted per query)
# --------------------------------------------------------------------------


@query(
    "tpch_q13_customer_distribution",
    oracle="""
SELECT c_count, cast(count(*) AS bigint) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '3-MEDIUM'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    section="B.3/B.4",
    notes="TPC-H Q13 (customer order distribution): LEFT join so "
    "zero-order customers land in the c_count=0 bucket, with the "
    "exclusion predicate INSIDE the join condition (moving it to "
    "WHERE would silently drop those customers — the classic "
    "outer-join-filter trap). Adaptation: the driver's orders table "
    "has no o_comment, so the 'special requests' exclusion filters "
    "o_orderpriority instead (reference schema: TPC-H spec 2.16). "
    "Two hash aggregations; the second groups a customer-cardinality "
    "relation by a tiny key domain",
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "3-MEDIUM"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").cast("bigint").alias("custdist")
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)', 4)}
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, rev.total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.supplier_no
WHERE rev.total_revenue = (SELECT max(total_revenue) FROM rev)
""",
    section="B.3/B.4",
    notes="TPC-H Q15 (top supplier): quarter revenue per supplier, "
    "then the argmax via an equality probe against the scalar max — "
    "revenue is a scaled-int sum (plans/util.py) so the double "
    "equality is exact and engine-independent, which is the only "
    "reason the spec's '= (SELECT max(...))' shape is safe to "
    "reproduce literally. The supplier-cardinality revenue relation "
    "persists for its two consumers (max + probe); the scalar max "
    "broadcasts",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                4,
            ).alias("total_revenue")
        )
        .transform(query_persist, StorageLevel.MEMORY_AND_DISK)
    )
    mx = rev.groupBy().agg(F.max("total_revenue").alias("mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(rev, s.s_suppkey == rev.supplier_no)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
WITH pq AS (
  SELECT l.l_partkey,
         {sql_dsum('l.l_quantity', 2)} / count(*) AS avg_qty
  FROM lineitem l GROUP BY l.l_partkey
)
SELECT {sql_dsum('l.l_extendedprice', 2)} / 7.0 AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#11' AND p.p_type = 'SMALL'
  AND l.l_quantity < 0.2 * pq.avg_qty
""",
    section="B.3/B.4",
    notes="TPC-H Q17 (small-quantity-order revenue): the correlated "
    "per-part average decorrelates into a pre-aggregated join "
    "(avg_qty per partkey), computed with the davg scaled-int "
    "discipline so the 0.2x threshold comparison is bit-identical in "
    "both engines. Adaptation: the driver's part table has no "
    "p_container, so the container predicate becomes p_type. The "
    "selective part filter prunes the probe via the join; the "
    "per-part aggregate is partkey-cardinality",
)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pq = li.groupBy("l_partkey").agg(
        (dsum("l_quantity", 2) / F.count("*")).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pq_partkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#11") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pq, li.l_partkey == pq.pq_partkey)
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .groupBy()
        .agg((dsum("l_extendedprice", 2) / F.lit(7.0)).alias("avg_yearly"))
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 16 AND 30
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 31 AND 50
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    section="B.3/B.4",
    notes="TPC-H Q19 (discounted revenue): three OR'd multi-column "
    "band predicates spanning both join sides — the shape that "
    "forces a post-join filter; the per-side prunable parts (brand "
    "IN set, size <= 50, quantity <= 30 overall bounds) still push "
    "into the scans. Adaptation: p_container bands become p_size "
    "bands (column absent). Scalar one-row output via scaled-int sum",
)
def tpch_q19_discounted_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(16, 30)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(31, 50)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(band)
        .groupBy()
        .agg(
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                4,
            ).alias("revenue")
        )
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
WITH pos AS (
  SELECT c_custkey, c_acctbal, c_nationkey % 5 AS cntrycode
  FROM customer
  WHERE c_nationkey % 5 IN (0, 1, 2) AND c_acctbal > 0.00
), avg_bal AS (
  SELECT {sql_dsum('c_acctbal', 2)} / count(*) AS ab FROM pos
)
SELECT pos.cntrycode,
       cast(count(*) AS bigint) AS numcust,
       {sql_dsum('pos.c_acctbal', 2)} AS totacctbal
FROM pos CROSS JOIN avg_bal
WHERE pos.c_acctbal > avg_bal.ab
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pos.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY pos.cntrycode
""",
    section="B.3/B.4",
    notes="TPC-H Q22 (global sales opportunity): above-average-"
    "balance customers with no orders, bucketed by country — the "
    "NOT EXISTS decorrelates to a LEFT ANTI join on custkey and the "
    "scalar average broadcasts (davg scaled-int, so the > threshold "
    "is engine-identical). Adaptations: customer has no c_phone, so "
    "the country code derives from c_nationkey % 5; and the driver's "
    "synthetic data gives EVERY customer an order, so 'no orders' "
    "becomes 'no orders since 2000-07-01' (the anti-join predicate "
    "filters the orders side before the join, keeping the spec's "
    "shape non-vacuous). The anti join's orders side projects only "
    "o_custkey",
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark import StorageLevel

    pos = (
        load(spark, sf_dir, "customer")
        .filter(
            (F.col("c_nationkey") % 5).isin(0, 1, 2)
            & (F.col("c_acctbal") > 0.00)
        )
        .select(
            "c_custkey",
            "c_acctbal",
            (F.col("c_nationkey") % 5).alias("cntrycode"),
        )
        .transform(query_persist, StorageLevel.MEMORY_AND_DISK)
    )
    ab = pos.groupBy().agg(
        (dsum("c_acctbal", 2) / F.count("*")).alias("ab")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-07-01").cast("timestamp")
        )
        .select("o_custkey")
    )
    return (
        pos.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, pos.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").cast("bigint").alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
    )


@query(
    "agg_hist_equi_depth",
    oracle="""
WITH tiled AS (
  SELECT l_extendedprice AS v,
         ntile(16) OVER (ORDER BY l_extendedprice, l_orderkey,
                         l_linenumber) AS b
  FROM lineitem
)
SELECT b AS bucket, cast(count(*) AS bigint) AS n,
       min(v) AS lo, max(v) AS hi
FROM tiled GROUP BY b
""",
    section="C",
    notes="equi-DEPTH histogram of l_extendedprice (16 buckets, equal "
    "row counts, data-driven boundaries) — the CBO selectivity "
    "structure that fixed-width bins (ts_histogram) can't provide on "
    "skewed domains: every bucket answers 'what range holds the next "
    "1/16th of rows'. ntile over a TOTAL order (price, orderkey, "
    "linenumber) is deterministic on both engines; lo/hi are element "
    "selections, zero float arithmetic. The global sort is the cost "
    "— at 100 TB build it from approx_percentile cutpoints instead "
    "(same shape, sketch-bounded boundary error), which is exactly "
    "how ANALYZE computes it",
)
def agg_hist_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    tiled = li.select(
        F.col("l_extendedprice").alias("v"),
        F.ntile(16)
        .over(
            Window.orderBy(
                "l_extendedprice", "l_orderkey", "l_linenumber"
            )
        )
        .alias("b"),
    )
    return tiled.groupBy(F.col("b").alias("bucket")).agg(
        F.count("*").cast("long").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


@query(
    "sql_qualify",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
FROM orders
QUALIFY rn <= 2
""",
    section="B.7",
    notes="QUALIFY surface parity (top-2 orders per customer): DuckDB "
    "runs the literal QUALIFY clause; Spark SQL has no QUALIFY, so "
    "the engine runs the canonical desugaring — window in a subquery, "
    "filter above it — over a temp view. Same single partitionBy "
    "shuffle either way; the deterministic (price DESC, orderkey) "
    "tie-break makes the kept set engine-exact",
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    return spark.sql(
        """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders_q4
) WHERE rn <= 2
"""
    )


@query(
    "agg_hist_equi_width",
    oracle="""
WITH ext AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
), binned AS (
  SELECT least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20.0))
                    AS BIGINT), 19) AS bin,
         lo, hi
  FROM orders CROSS JOIN ext
)
SELECT bin,
       round(lo + bin * ((hi - lo) / 20.0), 6) AS bin_lo,
       round(lo + (bin + 1) * ((hi - lo) / 20.0), 6) AS bin_hi,
       count(*) AS n
FROM binned GROUP BY bin, lo, hi
""",
    section="C",
    notes="equi-WIDTH histogram (the CBO twin of agg_hist_equi_depth): "
    "global min/max as a broadcast one-row scalar, then a zero-extra-"
    "shuffle bin map and one aggregation. The max value clamps into "
    "the last bin (least(..., 19)). Bin edges are doubles derived "
    "identically from the same min/max in both engines; counts are "
    "exact. At 100 TB the min/max pass is a map-side-combined scan — "
    "or comes free from zone-map stats (maint_stats_collect)",
)
def agg_hist_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    ext = o.groupBy().agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # one width expression reused on both sides of the aggregation
    # (lo/hi are carried through the group key, so it stays valid)
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    binned = o.crossJoin(F.broadcast(ext)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                "bigint"
            ),
            F.lit(19).cast("bigint"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin", "lo", "hi").agg(
        F.count("*").alias("n")
    ).select(
        "bin",
        F.round(F.col("lo") + F.col("bin") * width, 6).alias("bin_lo"),
        F.round(F.col("lo") + (F.col("bin") + 1) * width, 6).alias("bin_hi"),
        "n",
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
INTERSECT ALL
SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25
""",
    section="B.7",
    notes="bag-semantics INTERSECT ALL (multiplicity = min of the two "
    "sides' counts — the multiset operator BI diffing needs, distinct "
    "from set_intersect's dedup): Spark plans intersectAll as a "
    "count-aggregated join under the hood, one shuffle per side on "
    "the compared columns",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k")
    )
    b = li.filter(F.col("l_quantity") >= 25).select(
        F.col("l_suppkey").alias("k")
    )
    return a.intersectAll(b)


@query(
    "set_except_all",
    oracle="""
SELECT k FROM (
  SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT -l_suppkey AS k FROM lineitem
  WHERE l_orderkey % 500 = 0 AND l_suppkey > 0
)
EXCEPT ALL
SELECT l_suppkey AS k FROM lineitem WHERE l_quantity >= 25
""",
    section="B.7",
    notes="bag-semantics EXCEPT ALL (multiplicity = left count minus "
    "right count, floored at zero — 'what remains after cancelling "
    "one-for-one'): completes the multiset algebra with "
    "set_intersect_all / set_union_all. The original fixture "
    "cancelled to 0 rows at sf0.01 (a 0=0 attestation proves "
    "nothing — VERDICT r12), so the left bag plants NEGATED suppkeys "
    "from every 500th order, which survive with their exact "
    "multiplicity (duplicates included, pinning the ALL semantics)",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_suppkey").alias("k")
    ).unionAll(
        li.filter(
            (F.col("l_orderkey") % 500 == 0) & (F.col("l_suppkey") > 0)
        ).select((-F.col("l_suppkey")).alias("k"))
    )
    b = li.filter(F.col("l_quantity") >= 25).select(
        F.col("l_suppkey").alias("k")
    )
    return a.exceptAll(b)


def equi_depth_approx_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION form of agg_hist_equi_depth_approx: equi-depth
    histogram from approx_percentile cutpoints broadcast-joined back
    for bucket assignment — NO global-order window (the exact form's
    ntile sorts the world in one task; this plan is a mergeable
    sketch + a map). Both table scans are pruned to the single
    histogram column (plan-verified), the exact two-pass shape
    ANALYZE uses; the sketch pass's shuffle is one 15-element row.
    The registered query folds this into an exact-summary+envelope
    harness; a deployment runs THIS for the per-bucket rows."""
    li = load(spark, sf_dir, "lineitem")
    cuts = li.agg(
        F.percentile_approx(
            "l_extendedprice", [i / 16.0 for i in range(1, 16)], 10000
        ).alias("cuts")
    )
    # bucket = 1 + number of cutpoints strictly below v; ties land in
    # the lower bucket, matching ntile's stable ordering up to sketch
    # error at the 15 boundaries
    b = (
        li.crossJoin(F.broadcast(cuts))
        .select(
            F.col("l_extendedprice").alias("v"),
            (
                F.lit(1)
                + F.size(
                    F.filter(
                        F.col("cuts"),
                        lambda c: c < F.col("l_extendedprice"),
                    )
                )
            ).alias("bucket"),
        )
    )
    return b.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )


@query(
    "agg_hist_equi_depth_approx",
    oracle="""
SELECT cast(16 AS bigint) AS n_buckets,
       count(*) AS n_total,
       min(l_extendedprice) AS lo,
       max(l_extendedprice) AS hi,
       TRUE AS depth_ok
FROM lineitem
""",
    section="C",
    notes="sketch-cutpoint equi-depth histogram with an "
    "exact-summary+envelope oracle (VERDICT r07 #1): the summary row "
    "carries exact-deterministic facts — bucket count (16 whenever "
    "the column has >=16 distinct values; the oracle pins it, so a "
    "degenerate sketch hash-mismatches loudly), total mass "
    "(sum of bucket depths == count(*), proving the bucketing "
    "partitions the table), global lo/hi (data elements, "
    "bit-identical across engines) — plus depth_ok asserting "
    "max-min bucket depth spread <= 2*max(10, 10% of target depth), "
    "2000x the accuracy=10000 rank-error bound, deterministic for "
    "fixed data. Cutpoint VALUES stay out of the output. "
    "equi_depth_approx_hist above is the production per-bucket form; "
    "tests/test_properties.py still binds it to the exact ntile "
    "form per-bucket.",
)
def agg_hist_equi_depth_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = equi_depth_approx_hist(spark, sf_dir)
    stats = b.agg(
        F.count("*").alias("n_buckets"),
        F.sum("n").alias("n_total"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.max("n").alias("max_n"),
        F.min("n").alias("min_n"),
    )
    target = F.try_divide(F.col("n_total"), F.lit(16.0))
    slack = F.lit(2.0) * F.greatest(F.lit(10.0), F.lit(0.1) * target)
    return stats.select(
        "n_buckets",
        "n_total",
        "lo",
        "hi",
        ((F.col("max_n") - F.col("min_n")) <= slack).alias("depth_ok"),
    )


@query(
    "agg_approx_distinct_exact",
    oracle="""
SELECT l_returnflag,
       cast(count(DISTINCT l_linestatus) AS bigint) AS approx_status,
       cast(count(DISTINCT l_linenumber) AS bigint) AS approx_lines,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
    notes="exactness anchor for agg_approx_distinct (VERDICT r04 gap "
    "#4): HLL++ runs in its exact (sparse/linear-counting) regime "
    "when the true cardinality is far below the sketch size, so on "
    "the 2-value l_linestatus and 7-value l_linenumber domains "
    "approx_count_distinct provably equals the exact COUNT(DISTINCT) "
    "the DuckDB oracle computes — the same sketch code path the "
    "rows-only operator exercises, hash-matched here",
)
def agg_approx_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_linestatus", rsd=0.01).alias(
            "approx_status"
        ),
        F.approx_count_distinct("l_linenumber", rsd=0.01).alias(
            "approx_lines"
        ),
        F.count("*").alias("n_rows"),
    )


@query(
    "agg_approx_percentile_exact",
    oracle="""
SELECT l_returnflag,
       cast(quantile_disc(l_linenumber, 0.21) AS bigint) AS p21,
       cast(quantile_disc(l_linenumber, 0.50) AS bigint) AS p50,
       cast(quantile_disc(l_linenumber, 0.78) AS bigint) AS p78,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    section="B.4",
    notes="exactness anchor for agg_approx_percentile (VERDICT r04 "
    "gap #4): Greenwald-Khanna with accuracy 10000 has rank error "
    "n/10000 (and is EXACT below ~10k rows/group); on the 7-value "
    "l_linenumber domain every queried percentile (0.21/0.50/0.78) "
    "sits >6%% of mass inside a value plateau, so the sketch answer "
    "equals DuckDB's exact discrete quantile — same sketch code path "
    "as the rows-only operator, hash-matched here",
)
def agg_approx_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx(
        "l_linenumber", [0.21, 0.50, 0.78], 10000
    )
    return li.groupBy("l_returnflag").agg(
        F.get(pcts, 0).cast("long").alias("p21"),
        F.get(pcts, 1).cast("long").alias("p50"),
        F.get(pcts, 2).cast("long").alias("p78"),
        F.count("*").alias("n"),
    )
