"""TPC-H Q2/Q9/Q11/Q16/Q20/Q21 — the partsupp-dependent remainder.

The driver's fixture set (TESTDATA.md) has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate`` columns, so the six queries that
need them (the last gap in the 22-query showcase, VERDICT r03 "Next
round" #2) run on DERIVED relations computed identically by the Spark
plan and the DuckDB oracle from the tables both engines share:

* ``partsupp``: every part gets exactly 4 suppliers,
  ``ps_suppkey = (p_partkey + i*37) % |supplier|`` for i in 0..3
  (distinct for the fixture supplier counts 10/100/1000 — dbgen's own
  4-suppliers-per-part scheme, TPC-H spec §4.2.3, uses the same
  partkey-offset-mod-S shape). Key distinctness caveat: the four
  offsets {0, 37, 74, 111} collide mod S only when S divides one of
  their pairwise differences, i.e. S ∈ {1, 2, 3, 37, 74, 111} — no
  fixture SF hits those; if one ever did, the derivation would yield
  duplicate (partkey, suppkey) pairs IDENTICALLY in both engines
  (differential still exact), inflating join multiplicities. ``ps_availqty``/``ps_supplycost`` are
  deterministic integer hashes of the key pair, supplycost with
  exactly 2 decimal digits so min()/equality/products stay exact
  under the scaled-int discipline (plans/util.py).
* ``l_commitdate``/``l_receiptdate``: day-offset perturbations of
  ``l_shipdate`` from integer hashes of (orderkey, linenumber); the
  commit offset spans [-15, 15] so both Q21 branches (late and
  on-time) are populated.

Derivation cost at scale: partsupp is a narrow 4x flatMap over the
part scan plus one broadcast scalar (|supplier|) — no shuffle; the
lineitem date columns are zero-shuffle column maps. A real deployment
would materialize both once (maint_compact shape) rather than derive
per query; the derivation here stands in for the missing base table
without touching the read-only fixture directory.

Query shapes mirror the published TPC-H spec (public knowledge); the
spec's LIMIT clauses are dropped as in tpch_q18 (order-insensitive
driver compare; filters keep outputs small), and predicates on columns
the synthetic schema lacks (p_container, p_mfgr, s_address, s_comment)
are adapted to existing columns — each adaptation is noted per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.plans.util import dsum, sql_dsum

# Shared oracle CTE fragment: splice as  f"WITH {SQL_PARTSUPP}, ..."
SQL_PARTSUPP = """ps0 AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + g.i * 37) % (SELECT count(*) FROM supplier)
           AS ps_suppkey
  FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) g(i)
),
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         (ps_partkey * 7 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
         CAST((ps_partkey * 31 + ps_suppkey * 17) % 100000 + 100
              AS DOUBLE) / 100.0 AS ps_supplycost
  FROM ps0
)"""

# Shared oracle CTE: lineitem extended with derived commit/receipt
# dates (to_days keeps day-granularity timestamp arithmetic exact).
SQL_LINEITEM_DATED = """lineitem_dated AS (
  SELECT l.*,
         l_shipdate + to_days(CAST((l_orderkey * 7 + l_linenumber * 3)
                                   % 31 - 15 AS INTEGER))
           AS l_commitdate,
         l_shipdate + to_days(CAST((l_orderkey * 5 + l_linenumber * 11)
                                   % 30 + 1 AS INTEGER))
           AS l_receiptdate
  FROM lineitem l
)"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The partsupp relation both engines agree on (module docstring).

    Plan shape: part scan -> explode(4) -> column maps, with |supplier|
    as a broadcast scalar — no shuffle, linear in |part|.
    """
    p = load(spark, sf_dir, "part").select("p_partkey")
    s_n = (
        load(spark, sf_dir, "supplier")
        .groupBy()
        .agg(F.count("*").alias("s_n"))
    )
    ps0 = (
        p.crossJoin(F.broadcast(s_n))
        .select(
            "p_partkey",
            "s_n",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") + F.col("i") * 37) % F.col("s_n")).alias(
                "ps_suppkey"
            ),
        )
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        (
            (F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 11) % 9999 + 1
        ).alias("ps_availqty"),
        (
            (
                (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17)
                % 100000
                + 100
            ).cast("double")
            / F.lit(100.0)
        ).alias("ps_supplycost"),
    )


def dated_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + derived l_commitdate / l_receiptdate (zero-shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    commit_off = (
        (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 3) % 31 - 15
    ).cast("int")
    receipt_off = (
        (F.col("l_orderkey") * 5 + F.col("l_linenumber") * 11) % 30 + 1
    ).cast("int")
    return li.withColumns(
        {
            "l_commitdate": F.timestamp_add(
                "DAY", commit_off, F.col("l_shipdate")
            ),
            "l_receiptdate": F.timestamp_add(
                "DAY", receipt_off, F.col("l_shipdate")
            ),
        }
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
WITH {SQL_PARTSUPP},
eu AS (
  SELECT ps.ps_partkey, ps.ps_supplycost,
         s.s_acctbal, s.s_name, n.n_name
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
),
mc AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost
  FROM eu GROUP BY ps_partkey
)
SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_type
FROM eu
JOIN part p ON p.p_partkey = eu.ps_partkey
JOIN mc ON mc.ps_partkey = eu.ps_partkey
       AND eu.ps_supplycost = mc.min_cost
WHERE p.p_type = 'LARGE'
""",
    section="B.3/B.4",
    notes="TPC-H Q2 (minimum-cost supplier) on the derived partsupp: "
    "the correlated min-cost subquery decorrelates into a per-part "
    "min aggregate equi-joined back — the cost equality is safe "
    "because ps_supplycost is an exact 2-dp value identical in both "
    "engines. Adaptations: p_type='LARGE' stands in for the spec's "
    "p_size + '%BRASS' predicate (p_container absent), output takes "
    "p_type for the missing p_mfgr/s_address columns, and the "
    "LIMIT 100 is dropped (tpch_q18 precedent). Scale: region-nation-"
    "supplier legs broadcast; partsupp and the min-cost aggregate "
    "shuffle on ps_partkey only",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sn = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = ps.join(F.broadcast(sn), ps.ps_suppkey == sn.s_suppkey).select(
        "ps_partkey", "ps_supplycost", "s_acctbal", "s_name", "n_name"
    )
    mc = eu.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    ).withColumnRenamed("ps_partkey", "mc_partkey")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_type") == "LARGE"
    ).select("p_partkey", "p_type")
    return (
        eu.join(F.broadcast(p), eu.ps_partkey == p.p_partkey)
        .join(
            mc,
            (F.col("ps_partkey") == F.col("mc_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
    )


@query(
    "tpch_q9_product_type_profit",
    oracle=f"""
WITH {SQL_PARTSUPP}
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum(
           'l.l_extendedprice * (1 - l.l_discount)'
           ' - ps.ps_supplycost * l.l_quantity', 4)} AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
                AND ps.ps_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
""",
    section="B.3/B.4",
    notes="TPC-H Q9 (product-type profit) on the derived partsupp: "
    "profit = revenue minus supply cost, grouped by supplier nation "
    "and order year. The 4-dp scaled-int sum keeps the mixed "
    "2dp*2dp - 2dp*int products exact. The derived partsupp keeps "
    "only ~4/|supplier| of lineitem (inner join on the pair key) — "
    "identical in both engines. Scale: part/supplier/nation "
    "broadcast; the partsupp pair join and the orders join shuffle "
    "on their keys; year cast to bigint on both sides for schema "
    "parity",
)
def tpch_q9_product_type_profit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        - F.col("ps_supplycost") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey)
            & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(dsum(profit, dec=4).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
WITH {SQL_PARTSUPP},
flt AS (
  SELECT ps.ps_partkey,
         ps.ps_supplycost * ps.ps_availqty AS v
  FROM partsupp ps
  JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_7'
),
tot AS (SELECT {sql_dsum('v', 2)} AS total FROM flt)
SELECT ps_partkey, {sql_dsum('v', 2)} AS stock_value
FROM flt GROUP BY ps_partkey
HAVING {sql_dsum('v', 2)} > (SELECT total FROM tot) * 0.001
""",
    section="B.3/B.4",
    notes="TPC-H Q11 (important stock) on the derived partsupp: "
    "per-part stock value within one nation, kept when above a "
    "fraction of the national total. The HAVING scalar subquery "
    "becomes a broadcast one-row cross join; both the per-part sum "
    "and the total use the 2-dp scaled-int sum so the threshold "
    "comparison (identical doubles * 0.001) is engine-exact. "
    "Fraction adapted 0.0001 -> 0.001 for the fixture scale. Scale: "
    "supplier/nation broadcast; one shuffle on ps_partkey; the total "
    "is a map-side-combined scalar",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    flt = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_supplycost") * F.col("ps_availqty")).alias("v"),
        )
    )
    per_part = flt.groupBy("ps_partkey").agg(
        dsum("v", dec=2).alias("stock_value")
    )
    tot = flt.groupBy().agg(dsum("v", dec=2).alias("total"))
    return (
        per_part.crossJoin(F.broadcast(tot))
        .filter(F.col("stock_value") > F.col("total") * F.lit(0.001))
        .select("ps_partkey", "stock_value")
    )


@query(
    "tpch_q16_parts_supplier_relation",
    oracle=f"""
WITH {SQL_PARTSUPP}
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#11'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    section="B.3/B.4",
    notes="TPC-H Q16 (parts/supplier relationship) on the derived "
    "partsupp: distinct-supplier counts per (brand, type, size) "
    "excluding a supplier denylist. Adaptation: the spec's "
    "s_comment '%Customer%Complaints%' denylist becomes s_acctbal<0 "
    "(column absent); brand/size constants chosen for the synthetic "
    "domain. The NOT IN (null-free key) is a broadcast anti-join; "
    "the distinct-count shuffles once on the group key",
)
def tpch_q16_parts_supplier_relation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (~F.col("p_type").like("MEDIUM%"))
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_potential_promotion",
    oracle=f"""
WITH {SQL_PARTSUPP},
qty AS (
  SELECT l_partkey, l_suppkey, {sql_dsum('l_quantity', 0)} AS sq
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
cand AS (
  SELECT DISTINCT ps.ps_suppkey
  FROM partsupp ps
  JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') p
    ON p.p_partkey = ps.ps_partkey
  JOIN qty q ON q.l_partkey = ps.ps_partkey
            AND q.l_suppkey = ps.ps_suppkey
  WHERE ps.ps_availqty > 0.5 * q.sq
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_5'
  AND s.s_suppkey IN (SELECT ps_suppkey FROM cand)
""",
    section="B.3/B.4",
    notes="TPC-H Q20 (potential part promotion) on the derived "
    "partsupp: suppliers of 'small%' parts whose available quantity "
    "exceeds half of what they shipped in 1996. The correlated "
    "half-shipped-quantity subquery decorrelates into a "
    "(partkey, suppkey) pre-aggregate inner-joined to partsupp — the "
    "inner join reproduces the spec's NULL-comparison exclusion for "
    "pairs with no 1996 shipments. Quantities are integral so the "
    "0.5x threshold is exact. Scale: the part filter broadcasts; "
    "qty and partsupp shuffle on the same pair key; the final IN is "
    "a broadcast semi-join on the tiny candidate set",
)
def tpch_q20_potential_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ps = derived_partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity", dec=0).alias("sq")
    )
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    cand = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(
            qty,
            (ps.ps_partkey == qty.l_partkey)
            & (ps.ps_suppkey == qty.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.lit(0.5) * F.col("sq"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_5"
    ).select("n_nationkey")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(
            F.broadcast(cand),
            s.s_suppkey == cand.ps_suppkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle=f"""
WITH {SQL_LINEITEM_DATED},
ords AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_receiptdate > l_commitdate
                             THEN l_suppkey END) AS n_late
  FROM lineitem_dated GROUP BY l_orderkey
)
SELECT s.s_name, count(*) AS numwait
FROM lineitem_dated l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey
             AND o.o_orderstatus = 'F'
JOIN ords ON ords.l_orderkey = l1.l_orderkey
JOIN supplier s ON s.s_suppkey = l1.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND l1.l_receiptdate > l1.l_commitdate
  AND ords.n_supp >= 2
  AND ords.n_late = 1
GROUP BY s.s_name
""",
    section="B.3/B.4",
    notes="TPC-H Q21 (suppliers who kept orders waiting) on the "
    "derived commit/receipt dates: the spec's EXISTS (another "
    "supplier on the order) and NOT EXISTS (another LATE supplier) "
    "rewrite into one per-order aggregate — n_supp >= 2 and "
    "n_late = 1 — since a late l1 is itself one of the late "
    "suppliers. That replaces two inequality-conditioned self-joins "
    "with a single orderkey shuffle, the shape that survives scale. "
    "LIMIT 100 dropped (tpch_q18 precedent; one nation's suppliers "
    "bound the output). supplier/nation broadcast",
)
def tpch_q21_waiting_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = dated_lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_receiptdate") > F.col("l_commitdate")).alias("is_late"),
    )
    ords = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late"),
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    ).select("n_nationkey")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        li.filter(F.col("is_late"))
        .join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            ords.filter(
                (F.col("n_supp") >= 2) & (F.col("n_late") == 1)
            ).select("l_orderkey").withColumnRenamed(
                "l_orderkey", "ok"
            ),
            F.col("l_orderkey") == F.col("ok"),
            "left_semi",
        )
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
