#!/usr/bin/env python
"""Synthesize an sf1 dataset (10x sf0.1) for the scaling soak.

/root/testdata is read-only and the driver only materializes
sf{0.001,0.01,0.1}, so the superlinearity soak (VERDICT r03 "Next
round" #6) replicates sf0.1 ten times with KEY OFFSETS into
``.data_cache/sf1``. Replication preserves the distributional shape
that drives plan cost:

* fact tables (customer/orders/lineitem/events/part/supplier) get
  per-replica key offsets = replica * base-table cardinality, so key
  cardinality scales 10x while per-key row counts (join fan-outs,
  group sizes) stay constant — the way real SF growth behaves;
* region/nation stay single-copy (fixed dimensions, as in TPC-H);
* documents get the offset AND a per-replica text prefix token so the
  exact/near-duplicate RATE stays at the base level instead of
  jumping to 10 exact copies of everything (which would distort the
  dedup soak: block sizes would grow 10x at constant corpus
  diversity, a shape no real corpus has);
* embeddings get offset ids; identical vectors across replicas are
  fine — ANN cost is row-count-driven.

Usage: python tools/make_sf1.py [out_dir]   (default .data_cache/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# per-replica key offset unit = base cardinality of the keyed table
CARD = {
    "customer": 15_000,
    "supplier": 1_000,
    "part": 20_000,
    "orders": 150_000,
    "events": 100_000,
    "documents": 5_000,
    "embeddings": 2_000,
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
        # repartition to a multiple of the base layout so sf1 scans
        # parallelize like a natively-generated table would
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )
        print(f"  {name}: {df.count()} rows")

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
                # 10x users at constant per-user activity
                "user_id": F.col("user_id") + i * 1_000_000,
            }
        ),
    )
    replicate(
        "documents",
        lambda d, i: d.withColumns(
            {
                "doc_id": F.col("doc_id") + i * CARD["documents"],
                "text": F.concat(F.lit(f"r{i} "), F.col("text"))
                if i
                else F.col("text"),
                # keep the fixture invariant n_chars == length(text)
                # (functions.py relies on it; llm multibyte detection
                # compares octet_length vs n_chars)
                "n_chars": F.col("n_chars") + (len(f"r{i} ") if i else 0),
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
        else os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".data_cache",
            "sf1",
        )
    )
    spark = get_spark("make_sf1")
    scale(spark, out)
    print(f"sf1 written to {out}")
