"""UDF / UDAF / UDTF surface — SURVEY.md §2 B.10.

UDFs are the slow path (SURVEY.md guidance): everything that CAN be a
built-in expression elsewhere in this engine IS one. These queries
exist to prove the full Python-execution surface works — row UDF,
Arrow-vectorized pandas UDF, grouped-agg pandas UDF, grouped-map
applyInPandas, and a table UDTF — with deterministic logic so even
the Python paths oracle-check exactly.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.plans.registry import query


@query(
    "udf_scalar",
    oracle="""
SELECT c_custkey,
       cast(regexp_extract(c_name, '([0-9]+)$', 1) AS bigint) * 2
         + length(c_name) AS derived
FROM customer
""",
    section="B.10",
    notes="row-at-a-time Python UDF — deliberately present to cover the "
    "API; ~10-100x slower than the expression twin in the oracle",
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re

    @F.udf(returnType=LongType())
    def derive(name: str) -> int:
        m = re.search(r"([0-9]+)$", name)
        return (int(m.group(1)) if m else 0) * 2 + len(name)

    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", derive("c_name").alias("derived"))


@query(
    "udf_pandas",
    oracle="""
SELECT event_id, value * 0.5 + user_id AS score FROM events
""",
    section="B.10",
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-vectorized: numpy double ops are IEEE-identical to the
    # engine expression, so even this checks exactly.
    @F.pandas_udf(DoubleType())
    def score(value: pd.Series, user_id: pd.Series) -> pd.Series:
        return value * 0.5 + user_id

    ev = load(spark, sf_dir, "events")
    return ev.select("event_id", score("value", "user_id").alias("score"))


@query(
    "udaf_pandas",
    oracle="""
SELECT event_type,
       cast(sum(cast(round(value * 100) AS bigint)) AS double) / 100.0
         AS total_value
FROM events GROUP BY event_type
""",
    section="B.10",
)
def udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-agg pandas UDF using the same scaled-int64 discipline as
    # plans/util.dsum => exact, order-insensitive.
    import numpy as np

    @F.pandas_udf(DoubleType())
    def total(value: pd.Series) -> float:
        return float(np.rint(value.to_numpy() * 100).astype(np.int64).sum()) / 100.0

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(total("value").alias("total_value"))


@query(
    "udtf_apply",
    oracle="""
SELECT user_id, event_id,
       value - min(value) OVER (PARTITION BY user_id) AS delta_from_min
FROM events
""",
    section="B.10",
)
def udtf_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Grouped-map applyInPandas: one Arrow batch per user_id group.
    # min() involves no summation => exact across engines.
    def demin(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["user_id", "event_id"]].copy()
        out["delta_from_min"] = pdf["value"] - pdf["value"].min()
        return out

    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").applyInPandas(
        demin, "user_id bigint, event_id bigint, delta_from_min double"
    )


@query(
    "udtf_py",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')[1:3]) AS token
FROM documents
""",
    section="B.10",
)
def udtf_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Python UDTF (Spark >= 3.5): one input row -> N output rows,
    # invoked via a lateral join in SQL.
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string")
    class FirstTokens:
        def eval(self, text: str):
            for tok in text.split(" ")[:3]:
                yield (tok,)

    spark.udtf.register("first_tokens", FirstTokens)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        "SELECT d.doc_id, t.token FROM documents_v d,"
        " LATERAL first_tokens(d.text) t"
    )


@query(
    "udf_arrow",
    oracle="""
SELECT s_suppkey,
       length(s_name) + abs(s_nationkey) * 3 AS score
FROM supplier
""",
    section="B.10",
    notes="Arrow-optimized Python UDF (useArrow=True, Spark 4's "
    "preferred scalar-UDF transport): same per-row Python semantics "
    "as udf_scalar but rows cross the JVM boundary as Arrow batches "
    "instead of pickled tuples — the drop-in upgrade path when a "
    "Python UDF can't be expressed as a pandas UDF. Deterministic "
    "arithmetic keeps it exactly oracle-checkable",
)
def udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType=LongType(), useArrow=True)
    def score(name: str, nationkey: int) -> int:
        return len(name) + abs(nationkey) * 3

    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey", score("s_name", "s_nationkey").alias("score")
    )
