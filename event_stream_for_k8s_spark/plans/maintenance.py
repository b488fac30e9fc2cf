"""Table-maintenance operators — the ops a 100 TB parquet event
archive needs beyond queries (ROADMAP item 4).

The reference's storage story is "log to long-term storage"
(``README.md:3-5``); a Spark-native archive accretes small files (one
per micro-batch per partition) and needs (a) compaction and (b)
incremental consumption of only-what's-new. Both are expressible with
plain parquet + the public reader/writer API — no extra table-format
package — and both preserve content exactly, which is what the oracle
checks.
"""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.catalog import load
from event_stream_for_k8s_spark.plans.registry import query
from event_stream_for_k8s_spark.sources.roundtrip import (
    cache_dir,
    events_as_micros,
    materialize,
    restore_ts,
)

EVENTS_COLS = ("event_id", "ts", "user_id", "event_type", "value", "props")


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet directory into ceil(bytes/target) files.

    The streaming sink writes one file per micro-batch per partition;
    at 1000 executors that is millions of small files per day, and
    scan cost becomes dominated by file-open overhead (footer reads,
    S3 GETs). Compaction sizes output files from the MEASURED input
    bytes, not a guessed partition count. Returns the file count.
    """
    data_bytes = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, -(-data_bytes // target_file_bytes))
    df = spark.read.parquet(src)
    # repartition (round-robin shuffle), not coalesce: coalesce(1) would
    # also collapse the UPSTREAM read parallelism to one task.
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files


@query(
    "maint_compact",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    section="B.1",
    notes="small-file compaction: a 64-file micro-batch-shaped layout "
    "rewritten to byte-sized output files; content-identical (that is "
    "the check), file count asserted in tests/test_plans.py",
)
def maint_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    frag = materialize(
        spark,
        sf_dir,
        "events_fragmented",
        lambda o: events_as_micros(spark, sf_dir)
        .repartition(64)
        .write.mode("overwrite")
        .parquet(o),
    )
    compacted = cache_dir(sf_dir, "events_compacted")
    marker = os.path.join(compacted, "_CDONE")
    if not os.path.exists(marker):
        compact(spark, frag, compacted)
        with open(marker, "w") as f:
            f.write("ok")
    return restore_ts(spark.read.parquet(compacted))


@query(
    "maint_incremental",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props FROM events
WHERE event_id % 2 = 1
""",
    section="B.1",
    notes="incremental consumption of an accreting archive via "
    "modifiedAfter file filtering: batch 1 (even event_ids) written in "
    "the past, batch 2 (odd) now; the cursor read returns ONLY batch 2 "
    "without any bookkeeping table — the snapshot-read primitive "
    "checkpointed file-streams build on",
)
def maint_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = cache_dir(sf_dir, "events_incremental")
    marker = os.path.join(out, "_DONE")
    cutoff = "2026-01-01T00:00:00"
    if not os.path.exists(marker):
        base = events_as_micros(spark, sf_dir)
        for name, pred, mtime in (
            # batch 1: mtime before the cutoff; batch 2: after it
            ("b1", F.col("event_id") % 2 == 0, time.mktime((2025, 6, 1, 0, 0, 0, 0, 0, 0))),
            ("b2", F.col("event_id") % 2 == 1, time.mktime((2026, 6, 1, 0, 0, 0, 0, 0, 0))),
        ):
            part_dir = os.path.join(out, f"stage_{name}")
            base.filter(pred).coalesce(1).write.mode("overwrite").parquet(part_dir)
            (part,) = glob.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(out, f"{name}.parquet")
            os.replace(part, dst)
            os.utime(dst, (mtime, mtime))
            import shutil

            shutil.rmtree(part_dir)
        with open(marker, "w") as f:
            f.write("ok")
    return restore_ts(
        spark.read.option("modifiedAfter", cutoff).parquet(out)
    )


@query(
    "maint_merge_upsert",
    oracle="""
WITH changes AS (
  SELECT event_id, 'patched' AS event_type, round(value * 2, 2) AS value
  FROM events WHERE event_id % 10 = 3
  UNION ALL
  SELECT event_id + 10000000 AS event_id, 'inserted' AS event_type,
         round(value, 2) AS value
  FROM events WHERE event_id % 10 = 7
)
SELECT coalesce(c.event_id, b.event_id) AS event_id,
       coalesce(c.event_type, b.event_type) AS event_type,
       coalesce(c.value, round(b.value, 2)) AS value
FROM events b FULL JOIN changes c ON b.event_id = c.event_id
""",
    section="B.1",
    notes="MERGE INTO (upsert) expressed on plain parquet as a "
    "full-outer join + coalesce — matched rows take the change side, "
    "unmatched changes insert, unmatched base carries over. This is "
    "the rewrite Delta/Iceberg run under the hood; on partitioned "
    "layouts only partitions containing matches are rewritten",
)
def maint_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round("value", 2).alias("value")
    )
    changes = (
        base.filter(F.col("event_id") % 10 == 3)
        .select(
            "event_id",
            F.lit("patched").alias("event_type"),
            F.round(F.col("value") * 2, 2).alias("value"),
        )
        .unionByName(
            base.filter(F.col("event_id") % 10 == 7).select(
                (F.col("event_id") + 10_000_000).alias("event_id"),
                F.lit("inserted").alias("event_type"),
                "value",
            )
        )
    )
    b, c = base.alias("b"), changes.alias("c")
    return b.join(c, F.col("b.event_id") == F.col("c.event_id"), "full").select(
        F.coalesce("c.event_id", "b.event_id").alias("event_id"),
        F.coalesce("c.event_type", "b.event_type").alias("event_type"),
        F.coalesce("c.value", "b.value").alias("value"),
    )


@query(
    "maint_scd2",
    oracle="""
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         IS NULL) AS is_current
FROM events
""",
    section="B.5",
    notes="SCD-type-2 dimension build: change events -> effective-dated "
    "ranges via lead() per key (valid_from/valid_to, open-ended row "
    "flagged current). One window shuffle on the dimension key; the "
    "standard way a 100 TB fact side gets point-in-time joins",
)
def maint_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
