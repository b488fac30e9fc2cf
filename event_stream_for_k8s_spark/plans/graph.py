"""Graph operators over the event stream's co-occurrence graph.

The reference emits per-object event streams (`tasks.rs:105`); the
natural relational lift is the co-occurrence graph: two users are
adjacent when they were active in the same (hour, event_type) cell.
Degree and triangle/clustering statistics over that graph are the
standard abuse/community/bot signals a 100 TB event pipeline computes
(alongside the similarity-graph PageRank in `plans/llm.py`).

Graph construction is deterministic and TOTAL at scale:

- blocks are (hour, event_type) cells, so pair generation is an
  equi-join, never a cartesian;
- each block is capped at the first ``BLOCK_CAP`` users by user_id
  (``row_number``), so a Zipf-head mega-cell (everyone touches
  "api-server errors" in the same hour) costs at most
  ``BLOCK_CAP**2`` pairs instead of |block|**2 — the same
  oversized-block discipline as ``llm_dedup_ngram``'s salt cap. The
  oracle reproduces the capped semantics exactly.

Triangle counting uses DEGREE ORIENTATION (each undirected edge is
directed from its lower-(degree, id) endpoint to its higher one), the
published trick that bounds every vertex's out-degree at O(sqrt(m))
so the 2-path self-join never explodes on hub vertices — this is what
makes the plan survive a power-law graph at 1000 executors. The
triangle SET is orientation-independent, so the DuckDB oracle can use
plain id-ordered edges and still match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from event_stream_for_k8s_spark.caching import query_persist

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.plans.registry import query

BLOCK_CAP = 32

# Shared edge-set CTE (capped co-occurrence graph, id-ordered edges).
SQL_EDGES = f"""
hu AS (
  -- null user_ids are excluded BEFORE ranking: Spark orders nulls
  -- first, DuckDB last, so a null inside the cap window would make
  -- the capped membership engine-dependent
  SELECT DISTINCT date_trunc('hour', ts) AS h, event_type, user_id
  FROM events WHERE user_id IS NOT NULL
), cap AS (
  SELECT h, event_type, user_id,
         row_number() OVER (PARTITION BY h, event_type
                            ORDER BY user_id) AS rn
  FROM hu
), c AS (SELECT * FROM cap WHERE rn <= {BLOCK_CAP}),
e AS (
  SELECT DISTINCT a.user_id AS s, b.user_id AS d
  FROM c a JOIN c b
    ON a.h = b.h AND a.event_type = b.event_type
   AND a.user_id < b.user_id
)
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct id-ordered co-occurrence edges (s < d), block-capped."""
    ev = load(spark, sf_dir, "events")
    hu = (
        ev.filter(F.col("user_id").isNotNull())
        .select(
            F.date_trunc("hour", "ts").alias("h"), "event_type", "user_id"
        )
        .distinct()
    )
    w = Window.partitionBy("h", "event_type").orderBy("user_id")
    capped = (
        hu.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BLOCK_CAP)
        .drop("rn")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("s"), F.col("b.user_id").alias("d")
        )
        .distinct()
    )


@query(
    "graph_degree",
    oracle=f"""
WITH {SQL_EDGES},
und AS (SELECT s AS u, d AS v FROM e UNION ALL SELECT d, s FROM e)
SELECT u AS user_id, count(*) AS degree
FROM und GROUP BY 1
""",
    section="C",
    notes="degree per user of the capped co-occurrence graph "
    "(adjacent = same hour x event_type cell). Pair generation is an "
    "equi-join on the block key with a deterministic row_number cap "
    f"of {BLOCK_CAP} per block, so cost is linear in events plus "
    "BLOCK_CAP^2 per cell — no |block|^2 blowup on Zipf-head cells. "
    "Degree itself is one shuffle over 2|E| int rows",
)
def graph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both unionAll branches read the edge relation: persist so the
    # pair-generation join runs once (harness clears cache after)
    e = _edges(spark, sf_dir).transform(query_persist)
    und = e.select(F.col("s").alias("user_id")).unionAll(
        e.select(F.col("d").alias("user_id"))
    )
    return und.groupBy("user_id").agg(F.count("*").alias("degree"))




def _graph_core(spark: SparkSession, sf_dir: str):
    """(edges, degree, triangles) of the co-occurrence graph.

    Edges persist (read by the degree agg, the orientation join and —
    via ``oriented`` — three self-join sides); triangles come from the
    degree-oriented 2-path join (out-degree O(sqrt(m)) on hubs).
    Shared by graph_triangles and graph_jaccard.
    """
    e = _edges(spark, sf_dir).transform(query_persist)
    deg = (
        e.select(F.col("s").alias("user_id"))
        .unionAll(e.select(F.col("d").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count("*").alias("degree"))
    )
    ds = F.broadcast(deg).alias("ds")
    dd = F.broadcast(deg).alias("dd")
    ranked = (
        e.join(ds, F.col("s") == F.col("ds.user_id"))
        .join(dd, F.col("d") == F.col("dd.user_id"))
        .select(
            "s",
            "d",
            F.struct(F.col("ds.degree"), F.col("s")).alias("ks"),
            F.struct(F.col("dd.degree"), F.col("d")).alias("kd"),
        )
    )
    # Orient: lo -> hi by (degree, id); total order, no self-loops.
    oriented = ranked.select(
        F.when(F.col("ks") < F.col("kd"), F.col("s"))
        .otherwise(F.col("d"))
        .alias("lo"),
        F.when(F.col("ks") < F.col("kd"), F.col("d"))
        .otherwise(F.col("s"))
        .alias("hi"),
    ).transform(query_persist)
    o1 = oriented.alias("o1")
    o2 = oriented.alias("o2")
    o3 = oriented.alias("o3")
    paths = o1.join(o2, F.col("o1.hi") == F.col("o2.lo")).select(
        F.col("o1.lo").alias("x"),
        F.col("o1.hi").alias("y"),
        F.col("o2.hi").alias("z"),
    )
    tri = paths.join(
        o3,
        (F.col("x") == F.col("o3.lo")) & (F.col("z") == F.col("o3.hi")),
    ).select("x", "y", "z")
    return e, deg, tri


@query(
    "graph_triangles",
    oracle=f"""
WITH {SQL_EDGES},
tri AS (
  SELECT e1.s AS a, e1.d AS b, e2.d AS c
  FROM e e1
  JOIN e e2 ON e2.s = e1.d
  JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
), pern AS (
  SELECT a AS user_id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
), deg AS (
  SELECT u AS user_id, count(*) AS degree
  FROM (SELECT s AS u FROM e UNION ALL SELECT d FROM e) GROUP BY 1
)
SELECT deg.user_id, deg.degree,
       coalesce(t.n_triangles, 0) AS n_triangles,
       round(coalesce(t.n_triangles, 0) * 2.0
             / (deg.degree * (deg.degree - 1)), 6) AS clustering
FROM deg
LEFT JOIN (SELECT user_id, count(*) AS n_triangles
           FROM pern GROUP BY 1) t USING (user_id)
WHERE deg.degree > 1
""",
    section="C",
    notes="per-node triangle count + local clustering coefficient on "
    "the co-occurrence graph. Spark side orients every edge from its "
    "lower-(degree, id) endpoint to the higher one before the 2-path "
    "join — the standard O(m^1.5) triangle-enumeration bound: "
    "orientation caps out-degree at O(sqrt(m)) even on power-law hub "
    "vertices, so the path join's fan-out is bounded where the naive "
    "id-ordered join is quadratic in hub degree. The triangle set is "
    "orientation-independent, so the DuckDB oracle enumerates with "
    "plain id-ordering and matches exactly. clustering = "
    "2T/(deg*(deg-1)), a per-row double ratio rounded 6dp — exact "
    "division of exact ints on both engines. Degree-1 vertices are "
    "excluded (coefficient undefined)",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg, tri = _graph_core(spark, sf_dir)
    # ONE pass over the triangle stream: explode each triangle to its
    # three corners in the same task that enumerates it. The unionAll
    # formulation read `tri` three times, and since the triangle set
    # is far too large to persist (it dwarfs the edge relation on a
    # dense graph), that re-ran the 2-path join per branch — measured
    # 3x the whole query's cost at sf0.1 (180M triangles)
    pern = (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("user_id")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_triangles"))
    )
    return (
        deg.filter(F.col("degree") > 1)
        .join(F.broadcast(pern), "user_id", "left")
        .select(
            "user_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.round(
                F.coalesce("n_triangles", F.lit(0))
                * F.lit(2.0)
                / (F.col("degree") * (F.col("degree") - 1)),
                6,
            ).alias("clustering"),
        )
    )


@query(
    "graph_jaccard",
    oracle=f"""
WITH {SQL_EDGES},
tri AS (
  SELECT e1.s AS a, e1.d AS b, e2.d AS c
  FROM e e1
  JOIN e e2 ON e2.s = e1.d
  JOIN e e3 ON e3.s = e1.s AND e3.d = e2.d
), peredge AS (
  SELECT s, d, cast(count(*) AS bigint) AS common FROM (
    SELECT a AS s, b AS d FROM tri
    UNION ALL SELECT a, c FROM tri
    UNION ALL SELECT b, c FROM tri
  ) GROUP BY 1, 2
), deg AS (
  SELECT u AS user_id, count(*) AS degree
  FROM (SELECT s AS u FROM e UNION ALL SELECT d FROM e) GROUP BY 1
)
SELECT e.s, e.d, coalesce(pe.common, 0) AS common,
       round(coalesce(pe.common, 0) * 1.0
             / (ds.degree + dd.degree - coalesce(pe.common, 0)),
             6) AS jaccard
FROM e
LEFT JOIN peredge pe ON pe.s = e.s AND pe.d = e.d
JOIN deg ds ON ds.user_id = e.s
JOIN deg dd ON dd.user_id = e.d
""",
    section="C",
    notes="neighborhood Jaccard similarity per EDGE (the classic "
    "link-strength / tie-strength score): |N(s) ∩ N(d)| / "
    "|N(s) ∪ N(d)|. Common neighbors of an edge = triangles through "
    "it, so the count reuses the degree-oriented triangle "
    "enumeration (each triangle credits its three edges) instead of "
    "the naive wedge join at every common neighbor w — the latter "
    "costs Σ deg(w)^2 and detonates on hubs; triangle reuse keeps "
    "the O(m^1.5) bound. Union size = deg(s) + deg(d) - common "
    "(neighbor sets include the endpoints themselves, which cancel). "
    "Exact integer ratio rounded 6dp; triangle edges are "
    "re-normalized to id-order so the degree-oriented Spark "
    "enumeration matches the id-ordered oracle per edge",
)
def graph_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg, tri = _graph_core(spark, sf_dir)
    # Each triangle (x, y, z) credits its three edges; normalize each
    # credited pair to id-order (least, greatest) to match the
    # id-ordered edge relation regardless of degree orientation.
    # ONE pass over the triangle stream (see graph_triangles): each
    # triangle explodes to its three edges in the enumerating task —
    # the unionAll form re-ran the 2-path join per branch.
    pairs = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
                F.struct(F.col("x").alias("u"), F.col("z").alias("v")),
                F.struct(F.col("y").alias("u"), F.col("z").alias("v")),
            )
        ).alias("p")
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    peredge = (
        pairs.select(
            F.least("u", "v").alias("s"), F.greatest("u", "v").alias("d")
        )
        .groupBy("s", "d")
        .agg(F.count("*").cast("long").alias("common"))
    )
    ds = F.broadcast(deg).alias("ds")
    dd = F.broadcast(deg).alias("dd")
    return (
        e.join(F.broadcast(peredge), ["s", "d"], "left")
        .join(ds, F.col("s") == F.col("ds.user_id"))
        .join(dd, F.col("d") == F.col("dd.user_id"))
        .select(
            "s",
            "d",
            F.coalesce("common", F.lit(0)).alias("common"),
            F.round(
                F.coalesce("common", F.lit(0))
                * F.lit(1.0)
                / (
                    F.col("ds.degree")
                    + F.col("dd.degree")
                    - F.coalesce("common", F.lit(0))
                ),
                6,
            ).alias("jaccard"),
        )
    )
