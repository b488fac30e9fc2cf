"""Loaders for the driver-generated test tables (TESTDATA.md / FIXTURES.md).

At 100 TB these would be partitioned/bucketed external tables; locally
they are single parquet files. ``load`` keeps the scan declarative so
Catalyst applies column pruning + predicate pushdown (verify with
``df.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) and
        # TIMESTAMP(MICROS) across testdata generations; normalize either
        # to the engine-wide microsecond TimestampType (UTC session) so
        # every downstream plan sees one dtype. nanosAsLong lets the
        # vectorized reader accept the NANOS layout (read as long, then
        # truncate — the same truncation DuckDB applies).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views for SQL-style access; mirrors the oracle's view set."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
