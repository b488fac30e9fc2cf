"""Reference-parity queries (SURVEY.md §2 Part A composed end-to-end).

``flagship_dedup_count`` is the reference's entire hot path
(cisco-open/event-stream-for-k8s ``src/tasks.rs:95-127``) as one batch
DataFrame: duplicate stream -> A5 key -> A6 dedup -> A4 envelope/time
coalesce -> A8 multi-dim count.

``k8s_envelope_multidim_count`` additionally reproduces the §3.4
semantic fine print on a synthetic k8s-shaped stream: all four
timestamp-precedence branches (``src/types.rs:40-51``), missing-key
collision on '' (``src/types.rs:28,33``), and '-' metric-label
defaults (``src/tasks.rs:109-121``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.operators import (
    dedup_first_agg,
    dedup_key,
    dedup_rank,
)
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.plans.util import dsum, sql_dsum

FLAGSHIP_ORACLE = f"""
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
), keyed AS (
  SELECT *, concat_ws(':',
      coalesce(cast(event_id AS varchar), ''),
      coalesce(cast(user_id AS varchar), '')) AS k
  FROM doubled
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY k ORDER BY ts, event_id) AS rn
  FROM keyed
), deduped AS (
  SELECT coalesce(ts, timestamp '1970-01-01') AS time, *
  FROM ranked WHERE rn = 1
)
SELECT
  coalesce(event_type, '-') AS etype,
  user_id % 10 AS ubucket,
  strftime(time, '%Y-%m-%d') AS day,
  count(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM deduped
GROUP BY 1, 2, 3
"""


@query("flagship_dedup_count", oracle=FLAGSHIP_ORACLE, section="A1-A8")
def flagship_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    doubled = ev.unionAll(ev)  # every key exactly twice (FIXTURES.md)
    keyed = doubled.withColumn("k", dedup_key(["event_id", "user_id"]))
    deduped = dedup_rank(keyed, ["k"], ["ts", "event_id"])
    enveloped = deduped.select(
        F.coalesce("ts", F.lit("1970-01-01").cast("timestamp")).alias("time"),
        F.struct(*ev.columns).alias("kubernetes_event"),
    )
    return enveloped.groupBy(
        F.coalesce("kubernetes_event.event_type", F.lit("-")).alias("etype"),
        (F.col("kubernetes_event.user_id") % 10).alias("ubucket"),
        F.date_format("time", "yyyy-MM-dd").alias("day"),
    ).agg(
        F.count("*").alias("n_events"),
        dsum("kubernetes_event.value").alias("sum_value"),
    )


# Synthetic k8s Event shape derived deterministically from `events`:
# uid collides every 300 ids; resource_version cycles mod 7 (so the
# A5 key has real duplicates); timestamp fields populated per
# event_id % 4 to hit all four coalesce branches of src/types.rs:40-51.
K8S_ORACLE = """
WITH k8s AS (
  SELECT
    CASE WHEN event_id % 11 = 0 THEN NULL
         ELSE 'uid-' || cast(event_id % 300 AS varchar) END AS uid,
    CASE WHEN event_id % 13 = 0 THEN NULL
         ELSE cast(event_id % 7 AS varchar) END AS resource_version,
    CASE WHEN event_type = 'error' THEN 'Warning' ELSE 'Normal' END AS type,
    upper(event_type) AS reason,
    CASE WHEN user_id % 3 = 0 THEN 'Pod'
         WHEN user_id % 3 = 1 THEN 'Deployment' ELSE NULL END AS kind,
    'ns-' || cast(user_id % 5 AS varchar) AS namespace,
    CASE WHEN event_id % 4 = 0 THEN ts END AS last_ts,
    CASE WHEN event_id % 4 <= 1 THEN ts + INTERVAL 60 SECOND END AS first_ts,
    CASE WHEN event_id % 4 <= 2 THEN ts + INTERVAL 120 SECOND END AS created_ts,
    event_id, ts
  FROM events
), keyed AS (
  SELECT *,
    concat_ws(':', coalesce(uid, ''), coalesce(resource_version, '')) AS k,
    coalesce(last_ts, first_ts, created_ts,
             timestamp '1970-01-01') AS time
  FROM k8s
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY k ORDER BY time, event_id) rn
    FROM keyed) WHERE rn = 1
)
SELECT
  coalesce(type, '-') AS etype,
  coalesce(reason, '-') AS ereason,
  coalesce(kind, '-') AS ekind,
  coalesce(namespace, '-') AS ens,
  count(*) AS n_events
FROM deduped
GROUP BY 1, 2, 3, 4
"""


def synthetic_k8s(ev: DataFrame) -> DataFrame:
    """The deterministic k8s-Event shape derived from ``events`` (see
    comment above K8S_ORACLE). Shared by the multidim-count query and
    the Prometheus exposition egress (same §3.4 semantic branches)."""
    eid, uid = F.col("event_id"), F.col("user_id")
    return ev.select(
        F.when(eid % 11 != 0, F.concat(F.lit("uid-"), (eid % 300).cast("string"))).alias("uid"),
        F.when(eid % 13 != 0, (eid % 7).cast("string")).alias("resource_version"),
        F.when(F.col("event_type") == "error", "Warning").otherwise("Normal").alias("type"),
        F.upper("event_type").alias("reason"),
        F.when(uid % 3 == 0, "Pod").when(uid % 3 == 1, "Deployment").alias("kind"),
        F.concat(F.lit("ns-"), (uid % 5).cast("string")).alias("namespace"),
        F.when(eid % 4 == 0, F.col("ts")).alias("last_ts"),
        F.when(eid % 4 <= 1, F.col("ts") + F.expr("INTERVAL 60 SECOND")).alias("first_ts"),
        F.when(eid % 4 <= 2, F.col("ts") + F.expr("INTERVAL 120 SECOND")).alias("created_ts"),
        "event_id",
        "ts",
    )


def keyed_synthetic_k8s(ev: DataFrame) -> DataFrame:
    """synthetic_k8s + the A5 dedup key and A4 precedence time."""
    return (
        synthetic_k8s(ev)
        .withColumn("k", dedup_key(["uid", "resource_version"]))
        .withColumn(
            "time",
            F.coalesce(
                "last_ts", "first_ts", "created_ts",
                F.lit("1970-01-01").cast("timestamp"),
            ),
        )
    )


@query("k8s_envelope_multidim_count", oracle=K8S_ORACLE, section="A4-A8")
def k8s_envelope_multidim_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    keyed = keyed_synthetic_k8s(load(spark, sf_dir, "events"))
    # A6 dedup as a min_by AGGREGATION (dedup_first_agg), not a
    # window: the A5 key space here is tiny (~2.1k uid x rv combos)
    # relative to the stream, so map-side partial aggregation
    # collapses duplicates BEFORE the exchange — the shuffle carries
    # ~|keys| rows per mapper instead of every event, and no
    # per-partition sort runs. Row-for-row equal to dedup_rank:
    # (time, event_id) is total within each key. Payload pruned to
    # the four label columns the A8 rollup needs.
    deduped = dedup_first_agg(
        keyed.select(
            "k", "time", "event_id", "type", "reason", "kind", "namespace"
        ),
        ["k"],
        ["time", "event_id"],
    )
    return deduped.groupBy(
        F.coalesce("type", F.lit("-")).alias("etype"),
        F.coalesce("reason", F.lit("-")).alias("ereason"),
        F.coalesce("kind", F.lit("-")).alias("ekind"),
        F.coalesce("namespace", F.lit("-")).alias("ens"),
    ).agg(F.count("*").alias("n_events"))
