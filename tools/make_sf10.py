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
in TPC-H). documents get a per-replica ``s{i}`` text prefix — merged
into the FIRST WORD, no space — so the exact/near-duplicate RATE
stays at the base level instead of collapsing to 10 exact copies of
everything (n_chars is kept == length(text), the fixture invariant
functions.py relies on). The no-space merge matters: sf1's replicas
already prepend ``r{j} `` as a standalone word, and stacking a second
standalone marker makes every doc's first two words (s{i}, r{j}) —
collapsing join_fuzzy_blocked's opening-bigram blocking key to ~100
distinct values with ~50k-doc blocks, i.e. ~2e11 candidate pairs (a
measured 15-minutes-and-counting stall at sf10). Real 10x growth
grows the KEY SPACE; merging the marker into the first word keeps
block sizes at the sf1 distribution while block count scales 10x —
the behavior the soak is supposed to measure. Blocking-key
selectivity being a data property to re-audit at every scale step is
exactly the join_fuzzy_blocked plan note's warning, demonstrated by
the fixture generator itself.

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
    replicate(
        "documents",
        lambda d, i: d.withColumns(
            {
                "doc_id": F.col("doc_id") + i * CARD["documents"],
                # no-space merge into the first word (see module doc)
                "text": F.concat(F.lit(f"s{i}"), F.col("text"))
                if i
                else F.col("text"),
                "n_chars": F.col("n_chars") + (len(f"s{i}") if i else 0),
            }
        ),
    )
    replicate(
        "embeddings",
        lambda d, i: d.withColumn(
            "vec_id", F.col("vec_id") + i * CARD["embeddings"]
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
