"""Kubernetes Event source boundary.

The reference watches core/v1 Events cluster-wide (tasks.rs:150-182).
Per SURVEY.md §2 A1, k8s event COLLECTION stays out-of-band (an
off-cluster collector writes NDJSON to a directory or Kafka topic);
the engine's boundary is "a stream of Event JSON", read here with an
explicit schema — list-then-watch re-delivery on restart is absorbed
by the dedup stage exactly as the reference's sled state does.

Schema mirrors the fields the reference touches (types.rs:24-34,
tasks.rs:109-121) plus the opaque carried ones; everything nullable,
like the k8s OpenAPI model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from event_stream_for_k8s_spark.operators.dedup import dedup_key


def _s(name: str, t=None) -> StructField:
    return StructField(name, t or StringType(), nullable=True)


K8S_EVENT_SCHEMA = StructType(
    [
        StructField(
            "metadata",
            StructType(
                [
                    _s("uid"),
                    _s("resourceVersion"),
                    _s("name"),
                    _s("namespace"),
                    _s("creationTimestamp", TimestampType()),
                    _s("labels", MapType(StringType(), StringType())),
                    _s("annotations", MapType(StringType(), StringType())),
                ]
            ),
        ),
        _s("type"),
        _s("reason"),
        _s("message"),
        _s("count", IntegerType()),
        _s("lastTimestamp", TimestampType()),
        _s("firstTimestamp", TimestampType()),
        StructField(
            "involvedObject",
            StructType([_s("kind"), _s("namespace"), _s("name"), _s("uid")]),
        ),
    ]
)


def read_events_jsonl(
    spark: SparkSession, path: str, streaming: bool = True
) -> DataFrame:
    reader = spark.readStream if streaming else spark.read
    return reader.schema(K8S_EVENT_SCHEMA).json(path)


def event_time(now_fallback: Column | None = None) -> Column:
    """A4 timestamp precedence (types.rs:40-51): last -> first ->
    creation -> now(). Checked queries pass a literal fallback instead
    of current_timestamp() for determinism."""
    return F.coalesce(
        F.col("lastTimestamp"),
        F.col("firstTimestamp"),
        F.col("metadata.creationTimestamp"),
        now_fallback if now_fallback is not None else F.current_timestamp(),
    )


def event_key() -> Column:
    """A5 dedup key: uid:resourceVersion, missing parts -> ''."""
    return dedup_key([F.col("metadata.uid"), F.col("metadata.resourceVersion")])


def envelope(df: DataFrame, now_fallback: Column | None = None) -> DataFrame:
    """A4 envelope: {time, kubernetes_event} (types.rs:10-18)."""
    return df.select(
        event_time(now_fallback).alias("time"),
        F.struct(*df.columns).alias("kubernetes_event"),
    )
