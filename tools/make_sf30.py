#!/usr/bin/env python
"""Synthesize an sf30 spot-tier dataset (3x sf10) — VERDICT r12
"Next round" #7: confirm the three ≈data-ratio rows
(stream_dedup_ttl, llm_knn_brute, llm_hard_negatives) stay linear
one more 3x step before anyone believes the 100 TB story.

Same replication scheme as make_sf10.py, 3 replicas of sf10 with
per-replica key offsets equal to the sf10 cardinality. Content
distinctness follows the sf10 lessons verbatim:

- documents: a second PURE-LETTER word suffix per sf30 replica
  ("v" + letter), composing with the sf10 markers — within-replica
  structure exact, cross-replica shingles disjoint, every
  ^[a-z]+$-filtered pipeline still sees the whole corpus.
- embeddings: a further seeded coordinate permutation per replica
  (permutations compose, so each sf30 replica's internal geometry is
  still exactly sf1's; cross-replica cosines stay in the random
  band).

Usage: python tools/make_sf30.py [out_dir]  (default .data_cache/sf30)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(_ROOT, ".data_cache", "sf10")
REPLICAS = 3

# per-replica key offset unit = sf10 cardinality
CARD = {
    "customer": 1_500_000,
    "supplier": 100_000,
    "part": 2_000_000,
    "orders": 15_000_000,
    "events": 10_000_000,
    "documents": 500_000,
    "embeddings": 200_000,
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
        # 3x sf10's data at sf10's 64-partition layout would be ~3x
        # executor-comfortable size; widen to 128
        df.repartition(128).write.mode("overwrite").parquet(
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
                "user_id": F.col("user_id") + i * 100_000_000,
            }
        ),
    )

    def doc_text(i: int):
        if not i:
            return F.col("text")
        mark = "v" + "abc"[i]
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
        if not i:
            return F.col("embedding")
        perm = list(range(64))
        random.Random(3000 + i).shuffle(perm)
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
        else os.path.join(_ROOT, ".data_cache", "sf30")
    )
    if not os.path.isdir(os.path.join(SRC, "lineitem.parquet")):
        print(f"sf10 source missing at {SRC}; run tools/make_sf10.py first")
        sys.exit(2)
    spark = get_spark("make_sf30")
    scale(spark, out)
    print(f"sf30 written to {out}")
