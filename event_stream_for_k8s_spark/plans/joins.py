"""Joins — SURVEY.md §2 B.3.

Plan-shape notes (100 TB):
- Equi joins shuffle both sides on the key unless one side broadcasts;
  the star-schema dimensions here are broadcast-sized by design and
  ``join_broadcast`` pins that with an explicit hint. AQE converts
  shuffle joins to broadcast at runtime when the built side turns out
  small, and splits skewed partitions.
- ``join_interval`` carries an equality conjunct so Catalyst plans a
  hash join with the range as a residual filter — never a
  nested-loop over the full cross product.
- ``join_asof`` uses the union+window formulation (operators/joins.py)
  — one shuffle, no candidate-pair blowup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.operators import asof_join
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.plans.util import dsum, sql_dsum


@query(
    "join_inner_hash",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
       l.l_extendedprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
""",
    section="B.3",
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Fact-to-fact equi join: shuffles both sides on the key; AQE picks
    # SMJ vs shuffled-hash from observed sizes.
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey", "l_linenumber", "o_custkey", "o_orderstatus", "l_extendedprice"
    )


@query(
    "join_broadcast",
    oracle=f"""
SELECT p.p_brand, count(*) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 20
GROUP BY p.p_brand
""",
    section="B.3",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Star join: fact stays in place, dimension ships to every executor
    # — zero shuffle of lineitem before the aggregation.
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 20)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), dec=4).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_left",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
""",
    section="B.3",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
SELECT o.o_orderkey, c.c_custkey, c.c_mktsegment
FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    section="B.3",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "c_custkey", "c_mktsegment"
    )


@query(
    "join_full",
    oracle="""
SELECT cn.nk AS c_nk, sn.nk AS s_nk FROM
  (SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_nationkey < 20) cn
FULL JOIN
  (SELECT DISTINCT s_nationkey AS nk FROM supplier) sn
ON cn.nk = sn.nk
""",
    section="B.3",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 20)
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    sn = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    ).distinct()
    return cn.join(sn, cn.nk == sn.nk, "full").select(
        cn.nk.alias("c_nk"), sn.nk.alias("s_nk")
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
""",
    section="B.3",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""",
    section="B.3",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's dedup probe (tasks.rs:98-101) as a relational op:
    # emit only rows whose key is absent from committed state.
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_theta",
    oracle="""
SELECT s.s_suppkey, count(*) AS n_richer_customers
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
GROUP BY s.s_suppkey
""",
    section="B.3",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Equality conjunct keeps this a hash join with a residual range
    # predicate — the non-equi part never drives the join strategy.
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal),
        )
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_richer_customers"))
    )


@query(
    "join_interval",
    oracle="""
SELECT a.user_id, count(*) AS n_pairs, count(DISTINCT a.event_id) AS n_errors
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL 1 HOUR
 AND b.event_id <> a.event_id
WHERE a.event_type = 'error'
GROUP BY a.user_id
""",
    section="B.3",
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "Any activity within 1h after an error, per user" — interval
    # overlap with an equality conjunct, so it stays a hash join with a
    # residual range filter (no nested loop).
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").alias("a")
    b = ev.alias("b")
    return (
        a.join(
            b,
            (F.col("b.user_id") == F.col("a.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") < F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
            & (F.col("b.event_id") != F.col("a.event_id")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("a.event_id").alias("n_errors"),
        )
    )


@query(
    "join_asof",
    oracle="""
WITH cand AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT e.user_id, e.event_id, e.ts,
       c.o_orderkey AS o_orderkey_asof, c.o_orderdate AS o_orderdate_asof
FROM events e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.event_id = e.event_id
""",
    section="B.3",
    notes="oracle uses the quadratic join+rank formulation; the engine "
    "uses union+window (no pair blowup) — same result",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    return asof_join(
        ev,
        o,
        on=["user_id"],
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )


@query(
    "join_cross",
    oracle="""
SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
""",
    section="B.3",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Register lineitem/orders bucketed by the join key (8 buckets).

    Bucketing pre-shuffles data at WRITE time: both sides land in
    co-located buckets, so every later join/agg on the key runs with
    ZERO exchange (asserted in tests/test_plans.py). At 100 TB this is
    the difference between re-shuffling 100 TB per query and never
    shuffling the fact table at all.
    """
    import os

    import shutil
    from urllib.parse import urlparse

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    li, o = f"li_bucketed_{tag}", f"o_bucketed_{tag}"
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for name, src, key in ((li, "lineitem", "l_orderkey"), (o, "orders", "o_orderkey")):
        if not spark.catalog.tableExists(name):
            # bucket metadata lives in the session catalog, not the
            # files — a fresh session must rewrite; clear any stale
            # location left by a previous process first
            shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
            load(spark, sf_dir, src).write.bucketBy(8, key).sortBy(
                key
            ).mode("overwrite").format("parquet").saveAsTable(name)
    return li, o


@query(
    "join_bucketed",
    oracle=f"""
SELECT o.o_orderstatus, count(*) AS n,
       {sql_dsum('l.l_extendedprice')} AS sum_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
""",
    section="B.3",
    notes="co-located join on pre-bucketed tables: zero Exchange in "
    "the join (tests/test_plans.py asserts it)",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, o = _bucketed_tables(spark, sf_dir)
    return (
        spark.table(li)
        .join(spark.table(o), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), dsum("l_extendedprice").alias("sum_price"))
    )


@query(
    "join_range_binned",
    oracle="""
SELECT a.event_id, count(*) AS n_nearby
FROM events a JOIN events b
  ON b.ts >= a.ts - INTERVAL 30 MINUTE
 AND b.ts <= a.ts + INTERVAL 30 MINUTE
 AND b.event_id <> a.event_id
GROUP BY a.event_id
""",
    section="B.3",
    notes="PURE range join (no equality conjunct) answering a COUNT: "
    "n_nearby(a) = cum(ta+30m) - cum(ta-30m-1us) - 1 via a "
    "distributed two-level prefix sum instead of materializing the "
    "pair stream. The round-4 sf1 soak flagged the previous binned "
    "self-join at 30x for 10x data: with a fixed time span, event "
    "density grows with SF, so any plan that STREAMS the qualifying "
    "pairs does O(N*density) work — quadratic in SF — while the "
    "count itself is O(1) per event. Shape: (1) per-timestamp counts; "
    "(2) per-day bucket totals, prefix-summed on a bucket-cardinality "
    "relation (tiny, single-partition window is fine); (3) in-bucket "
    "running sums + the two probe points per event resolved by a "
    "last-non-null window per bucket, seeded with a synthetic "
    "bucket-start anchor carrying the prior-bucket cumulative so a "
    "probe before any in-bucket event still resolves. All shuffles "
    "are keyed (ts, day-bucket, event_id); bucket width is the skew "
    "knob at scale. A JOIN that must emit the pairs themselves keeps "
    "the binned equi-join shape (join_interval); a count/aggregate "
    "over a range predicate should always take this prefix form",
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.operators.range_count import (
        range_count_by_id,
    )

    # microsecond arithmetic: unix_seconds would truncate sub-second
    # precision and admit rows just past the boundary
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("t")
    )
    return range_count_by_id(
        ev,
        id_col="event_id",
        t_col="t",
        half=1800 * 1_000_000,
        bucket=86_400 * 1_000_000,
    )


@query(
    "join_skew_salted",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority, o.o_totalprice
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'O'
""",
    section="B.3",
    notes="salted join for skewed keys, AQE-independent: the fact side "
    "gets a deterministic 16-way salt from a row-unique hash, the "
    "dim side is replicated 16x (explode over the salt range), and "
    "the join runs on (key, salt) -- a hot key's rows now land on 16 "
    "tasks instead of one. Result provably equals the plain join "
    "(each fact row meets exactly the one replica carrying its "
    "salt). Oracle IS the plain join. At 100 TB you salt only the "
    "keys AQE's skew stats flag; here every key is salted to pin the "
    "rewrite",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_salt = 16
    li = load(spark, sf_dir, "lineitem").withColumn(
        "_salt",
        F.pmod(
            F.xxhash64("l_orderkey", "l_linenumber", "l_partkey"),
            F.lit(n_salt),
        ),
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    o_rep = o.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return (
        li.join(
            o_rep,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (li["_salt"] == o_rep["_salt"]),
        )
        .select(
            "l_orderkey", "l_linenumber", "o_orderpriority", "o_totalprice"
        )
    )


@query(
    "join_asof_forward",
    oracle="""
WITH cand AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate ASC, o.o_orderkey DESC) rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
)
SELECT e.user_id, e.event_id, e.ts,
       c.o_orderkey AS o_orderkey_next, c.o_orderdate AS o_orderdate_next
FROM events e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.event_id = e.event_id
""",
    section="B.3",
    notes="FORWARD as-of join (nearest right row at-or-AFTER each left "
    "time): implemented as the backward union+window operator on "
    "NEGATED epoch keys -- one reusable primitive covers both "
    "directions, still no pair blowup. Tie at equal right time "
    "resolves to the max tiebreak key (negation flips 'last wins'), "
    "which the oracle mirrors with o_orderkey DESC",
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.operators.joins import asof_join

    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", (-F.unix_micros("ts")).alias("tneg")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        "o_orderkey",
        "o_orderdate",
        (-F.unix_micros(F.col("o_orderdate").cast("timestamp"))).alias(
            "tneg"
        ),
    )
    joined = asof_join(
        ev,
        o,
        on=["user_id"],
        left_time="tneg",
        right_time="tneg",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        suffix="_next",
    )
    return joined.select(
        "user_id",
        "event_id",
        "ts",
        F.col("o_orderkey_next"),
        F.col("o_orderdate_next"),
    )


@query(
    "join_asof_nearest",
    oracle="""
WITH cand AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
           ORDER BY abs(epoch_us(e.ts) - epoch_us(o.o_orderdate)) ASC,
                    (o.o_orderdate > e.ts) ASC,
                    o.o_orderkey DESC) rn
  FROM events e JOIN orders o ON o.o_custkey = e.user_id
)
SELECT e.user_id, e.event_id, e.ts,
       c.o_orderkey AS o_orderkey_near, c.o_orderdate AS o_orderdate_near
FROM events e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.event_id = e.event_id
""",
    section="C",
    notes="NEAREST as-of join (closest right row in EITHER direction; "
    "equidistant ties resolve backward, then max key): composed from "
    "the two directional union+window passes — backward and "
    "negated-key forward — merged by an equi-join on the left key "
    "with a |dt| comparison. Still no pair blowup: each pass is one "
    "window over the union, the oracle's quadratic join+rank is the "
    "spec. The sensor-fusion/feature-alignment semantic (closest "
    "reading to each observation) that neither <= nor >= alone gives",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    # copy rank: redelivered (identical-duplicate) left rows would
    # cross-pair in the backward x forward merge below (2 copies -> 4
    # rows); ranking copies makes the merge key unique so each copy
    # pairs with itself — identical copies, so the nondeterministic
    # rank assignment can't show in the output
    ev = ev.withColumn(
        "cp",
        F.row_number().over(
            Window.partitionBy("event_id").orderBy("ts", "user_id")
        ),
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    back = asof_join(
        ev,
        o,
        on=["user_id"],
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    ev_n = ev.withColumn("tneg", -F.unix_micros("ts"))
    o_n = o.withColumn(
        "tneg", -F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    )
    fwd = asof_join(
        ev_n,
        o_n,
        on=["user_id"],
        left_time="tneg",
        right_time="tneg",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
        suffix="_next",
    ).select("event_id", "cp", "o_orderkey_next", "o_orderdate_next")
    j = back.join(fwd, ["event_id", "cp"])
    t_us = F.unix_micros("ts")
    db = t_us - F.unix_micros(F.col("o_orderdate_asof").cast("timestamp"))
    df_ = F.unix_micros(F.col("o_orderdate_next").cast("timestamp")) - t_us
    take_back = F.col("o_orderdate_next").isNull() | (
        F.col("o_orderdate_asof").isNotNull() & (db <= df_)
    )
    return j.select(
        "user_id",
        "event_id",
        "ts",
        F.when(take_back, F.col("o_orderkey_asof"))
        .otherwise(F.col("o_orderkey_next"))
        .alias("o_orderkey_near"),
        F.when(take_back, F.col("o_orderdate_asof"))
        .otherwise(F.col("o_orderdate_next"))
        .alias("o_orderdate_near"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
WITH cand AS (
  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
   AND o.o_orderdate >= e.ts - INTERVAL 30 DAY
)
SELECT e.user_id, e.event_id, e.ts,
       c.o_orderkey AS o_orderkey_tol, c.o_orderdate AS o_orderdate_tol
FROM events e LEFT JOIN (SELECT * FROM cand WHERE rn = 1) c
  ON c.event_id = e.event_id
""",
    section="C",
    notes="as-of join with a staleness tolerance (feature-store "
    "semantics: a feature older than 30 days is no feature at all). "
    "Composed on the SAME union+window backward as-of primitive -- "
    "the latest match <= t is within tolerance iff any match in "
    "[t - tol, t] is, so a post-pass null-out needs no second plan "
    "shape and inherits the no-pair-blowup property. The oracle "
    "keeps the quadratic join+rank form with the window bound in "
    "the join condition",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    res = asof_join(
        ev,
        o,
        on=["user_id"],
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_orderdate"],
        tiebreak="o_orderkey",
    )
    fresh = F.col("o_orderdate_asof") >= F.col("ts") - F.expr(
        "INTERVAL 30 DAY"
    )
    return res.select(
        "user_id",
        "event_id",
        "ts",
        F.when(fresh, F.col("o_orderkey_asof")).alias("o_orderkey_tol"),
        F.when(fresh, F.col("o_orderdate_asof")).alias("o_orderdate_tol"),
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 60) AS head,
         split_part(text, ' ', 1) || ' ' || split_part(text, ' ', 2) AS blk
  FROM documents
)
SELECT a.blk AS blk,
       count(*) AS n_pairs,
       count(*) FILTER (levenshtein(a.head, b.head) = 0) AS n_exact,
       count(*) FILTER (levenshtein(a.head, b.head) BETWEEN 1 AND 10)
           AS n_near
FROM d a JOIN d b
  ON a.blk = b.blk AND a.doc_id < b.doc_id
GROUP BY a.blk
""",
    section="B.3",
    notes="blocked fuzzy entity resolution (reference's dedup pipeline "
    "does exact keys only; this is the approximate-match extension a "
    "training-data catalog needs): candidate pairs come from an "
    "EQUI-join on a cheap blocking key (the document's first two "
    "tokens — near-duplicate docs share openings, so real near-dups "
    "co-block), so the O(n^2) all-pairs edit-distance never "
    "materializes — cost is sum over blocks of |block|^2, and the "
    "block key is the shuffle key so each block resolves on one "
    "executor. The edit distance runs on a fixed 60-char prefix: "
    "levenshtein is O(len^2) DP, so capping the operand bounds "
    "per-pair cost no matter how long documents get (the full-text "
    "confirm tier is llm_dedup_ngram). Distance bands: =0 exact "
    "prefix duplicates, 1..10 near-miss variants. Previously blocked "
    "on part.p_name's first token; the regenerated part table has "
    "only 8 distinct first tokens (2.5k-row blocks, 50M pairs, 8-way "
    "parallelism) — a worked example of blocking-key selectivity "
    "being a DATA property to re-audit when the corpus changes",
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, 60).alias("head"),
        F.concat_ws(
            " ",
            F.split("text", " ")[0],
            # total key: out-of-bounds second token -> NULL (get, not
            # [1] which throws under ANSI) -> '' to match the oracle's
            # split_part semantics on 1-token docs (ADVICE r02)
            F.coalesce(F.get(F.split("text", " "), 1), F.lit("")),
        ).alias("blk"),
    )
    a, b = d.alias("a"), d.alias("b")
    lev = F.levenshtein(F.col("a.head"), F.col("b.head"))
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.blk").alias("blk"), lev.alias("lev"))
    return pairs.groupBy("blk").agg(
        F.count("*").alias("n_pairs"),
        F.count(F.when(F.col("lev") == 0, 1)).alias("n_exact"),
        F.count(F.when(F.col("lev").between(1, 10), 1)).alias("n_near"),
    )


@query(
    "join_null_safe",
    oracle="""
WITH a AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg, c_custkey FROM customer
), b AS (
  SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
         count(*) AS seg_total
  FROM customer GROUP BY 1
)
SELECT a.c_custkey, a.seg, b.seg_total
FROM a JOIN b ON a.seg IS NOT DISTINCT FROM b.seg
""",
    section="B.3",
    notes="null-safe equi-join (Spark <=>, SQL IS NOT DISTINCT FROM): "
    "NULL keys match each other instead of vanishing — the semantics "
    "SCD/dimension pipelines need when 'unknown' is a real bucket. "
    "One segment is NULLified to exercise the null bucket. Plans as a "
    "regular hash join (null-safe equality is hashable); the "
    "broadcast side is segment-cardinality",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    a = c.select(seg.alias("seg"), "c_custkey")
    b = (
        c.select(seg.alias("bseg"))
        .groupBy("bseg")
        .agg(F.count("*").alias("seg_total"))
    )
    return (
        a.join(F.broadcast(b), a.seg.eqNullSafe(b.bseg))
        .select("c_custkey", "seg", "seg_total")
    )
