#!/usr/bin/env python
"""Synthesize an sf10 dataset (10x sf1, 100x sf0.1) for the next-decade
scaling soak (VERDICT r11 "Next round" #1).

Same replication scheme as make_sf1.py, one decade up: reads the sf1
parquet tables from ``.data_cache/sf1`` (generate them first with
``python tools/make_sf1.py``) and replicates each fact table 10x with
per-replica KEY OFFSETS equal to the sf1 cardinality (= 10x the sf0.1
base cardinality), so key cardinality scales 10x while per-key row
counts (join fan-outs, group sizes) stay constant — the way real SF
growth behaves. region/nation stay single-copy (fixed dimensions, as
in TPC-H).

**Replicas must be DISTINCT in content space, not just key space** —
the central lesson of the first two sf10 soak runs, both of which
caught the GENERATOR, not a plan:

- documents: suffixing every WORD with a PURE-LETTER replica marker
  (``w`` -> ``w + 'q' + chr(ord('a')+i)``) keeps each replica's
  internal structure exact — word counts, planted near-duplicate
  pairs, quality features, block-size distributions all match sf1 —
  while making cross-replica shingle sets disjoint and the
  opening-bigram blocking key scale 10x. Three earlier schemes each
  failed a different consumer, all caught by soak rows: a standalone
  ``s{i} `` prefix word collapsed join_fuzzy_blocked's blocking key
  to ~100 values x ~50k-doc blocks (~2e11 pairs, measured stall); a
  first-word merge left every doc with ~100 cross-replica
  NEAR-duplicates (quadratic fuel for every MinHash/LSH bucket); a
  DIGIT-bearing word suffix (``ws3``) silently knocked 90% of the
  corpus out of every ``^[a-z]+$``-filtered pipeline — the BPE
  family's sf10 soak read 1.0x because it was training on replica 0
  alone. Letters keep every filter passing. n_chars is recomputed as
  length(text) (the fixture invariant functions.py relies on).
- embeddings: sf1's replication copies each VECTOR verBATIM (only
  vec_id shifts), so sf10-by-copy gives every vector ~100 exact
  clones — identical LSH signatures, 100x bucket sizes, ~100x
  candidate pairs (llm_dedup_clusters_lsh measured 61.9x sf1->sf10
  before this fix). Each replica now applies a seeded COORDINATE
  PERMUTATION to the embedding array: norms and all within-replica
  dot products are preserved EXACTLY (replica geometry == sf1
  geometry, including planted duplicate pairs), while cross-replica
  cosines drop to the random-direction band (~N(0, 1/sqrt(64))),
  far below every dedup/ANN threshold in the registry. Replica 0 is
  the identity.

Blocking-key/bucket selectivity being a data property to re-audit at
every scale step is exactly the join_fuzzy_blocked plan note's
warning — demonstrated by the fixture generator itself, twice.

Only the parquet tables are scaled — the derived stream/JSON fixtures
in the sf1 dir are per-query caches the fixture machinery rebuilds on
demand from the parquet.

Usage: python tools/make_sf10.py [out_dir]   (default .data_cache/sf10)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_ROOT, ".data_cache", "sf1")
REPLICAS = 10

# per-replica key offset unit = sf1 cardinality (10x the sf0.1 base)
CARD = {
    "customer": 150_000,
    "supplier": 10_000,
    "part": 200_000,
    "orders": 1_500_000,
    "events": 1_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
}


def scale(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    def replicate(name: str, shift):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [shift(base, i) for i in range(REPLICAS)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        # wider layout than sf1 (32 -> 64): sf10 partitions would be
        # ~2x executor-comfortable size at 32
        df.repartition(64).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"  {name}: {df.count()} rows", flush=True)

    replicate(
        "customer",
        lambda d, i: d.withColumn(
            "c_custkey", F.col("c_custkey") + i * CARD["customer"]
        ),
    )
    replicate(
        "supplier",
        lambda d, i: d.withColumn(
            "s_suppkey", F.col("s_suppkey") + i * CARD["supplier"]
        ),
    )
    replicate(
        "part",
        lambda d, i: d.withColumn(
            "p_partkey", F.col("p_partkey") + i * CARD["part"]
        ),
    )
    replicate(
        "orders",
        lambda d, i: d.withColumns(
            {
                "o_orderkey": F.col("o_orderkey") + i * CARD["orders"],
                "o_custkey": F.col("o_custkey") + i * CARD["customer"],
            }
        ),
    )
    replicate(
        "lineitem",
        lambda d, i: d.withColumns(
            {
                "l_orderkey": F.col("l_orderkey") + i * CARD["orders"],
                "l_partkey": F.col("l_partkey") + i * CARD["part"],
                "l_suppkey": F.col("l_suppkey") + i * CARD["supplier"],
            }
        ),
    )
    replicate(
        "events",
        lambda d, i: d.withColumns(
            {
                "event_id": F.col("event_id") + i * CARD["events"],
                # 10x users again at constant per-user activity
                "user_id": F.col("user_id") + i * 10_000_000,
            }
        ),
    )
    def doc_text(i: int):
        # suffix every word with a pure-letter replica marker (see
        # module doc): within-replica structure exact, cross-replica
        # shingles disjoint, key spaces scale 10x, and every
        # ^[a-z]+$-filtered pipeline still sees the whole corpus
        if not i:
            return F.col("text")
        mark = "q" + "abcdefghij"[i]
        return F.array_join(
            F.transform(
                F.split("text", " "), lambda w: F.concat(w, F.lit(mark))
            ),
            " ",
        )

    replicate(
        "documents",
        lambda d, i: d.withColumns(
            {
                "doc_id": F.col("doc_id") + i * CARD["documents"],
                "text": doc_text(i),
            }
        ).withColumn("n_chars", F.length("text").cast("bigint")),
    )

    import random

    def perm_vec(i: int):
        # seeded per-replica coordinate permutation (see module doc):
        # replica geometry identical to sf1, cross-replica cosines at
        # the random band. Identity for replica 0.
        if not i:
            return F.col("embedding")
        perm = list(range(64))
        random.Random(1000 + i).shuffle(perm)
        return F.array(*[F.col("embedding")[p] for p in perm])

    replicate(
        "embeddings",
        lambda d, i: d.withColumns(
            {
                "vec_id": F.col("vec_id") + i * CARD["embeddings"],
                "embedding": perm_vec(i),
            }
        ),
    )


if __name__ == "__main__":
    out = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(_ROOT, ".data_cache", "sf10")
    )
    if not os.path.isdir(os.path.join(SRC, "lineitem.parquet")):
        print(f"sf1 source missing at {SRC}; run tools/make_sf1.py first")
        sys.exit(2)
    spark = get_spark("make_sf10")
    scale(spark, out)
    print(f"sf10 written to {out}")
