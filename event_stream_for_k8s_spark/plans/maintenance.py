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

from event_stream_for_k8s_spark.caching import query_persist

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
    cutoff = "2026-01-01T00:00:00"

    def build(out: str) -> None:
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

    out = materialize(spark, sf_dir, "events_incremental", build)
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
    from event_stream_for_k8s_spark.operators.maintenance import (
        merge_upsert,
    )

    return merge_upsert(base, changes, ["event_id"])


@query(
    "maint_scd2",
    oracle="""
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id
                      ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
         AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id
                       ORDER BY ts NULLS FIRST, event_id NULLS FIRST)
         IS NULL) AS is_current
FROM events
""",
    section="B.5",
    notes="SCD-type-2 dimension build: change events -> effective-dated "
    "ranges via lead() per key (valid_from/valid_to, open-ended row "
    "flagged current). One window shuffle on the dimension key; the "
    "standard way a 100 TB fact side gets point-in-time joins. The "
    "oracle pins NULLS FIRST explicitly: Spark's ASC default is "
    "nulls-first while DuckDB's is nulls-last, and a NULL effective "
    "date must sort as before-all-time, not become the current row "
    "(r08 operator extraction; no NULL ts in the fixture, so results "
    "are unchanged there)",
)
def maint_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from event_stream_for_k8s_spark.operators.maintenance import scd2

    ev = load(spark, sf_dir, "events")
    return scd2(
        ev.select("user_id", "event_type", "ts", "event_id"),
        keys=["user_id"],
        ts_col="ts",
        tiebreak="event_id",
    ).drop("event_id")


@query(
    "maint_stats_collect",
    oracle="""
SELECT 'l_quantity' AS col_name,
       count(*) AS n_rows,
       cast(count(*) - count(l_quantity) AS bigint) AS n_nulls,
       cast(count(DISTINCT l_quantity) AS bigint) AS ndv,
       cast(min(l_quantity) AS varchar) AS min_val,
       cast(max(l_quantity) AS varchar) AS max_val
FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(*),
       cast(count(*) - count(l_returnflag) AS bigint),
       cast(count(DISTINCT l_returnflag) AS bigint),
       min(l_returnflag), max(l_returnflag)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(*),
       cast(count(*) - count(l_shipdate) AS bigint),
       cast(count(DISTINCT l_shipdate) AS bigint),
       cast(min(l_shipdate) AS varchar), cast(max(l_shipdate) AS varchar)
FROM lineitem
""",
    section="B.1",
    notes="ANALYZE-style per-column statistics (rows / nulls / NDV / "
    "min / max) in long format -- what the cost-based optimizer and "
    "file-skipping indexes are built from. One pass per column here "
    "for oracle clarity; at 100 TB you fuse them into one aggregate "
    "with approx_count_distinct and write the result as table "
    "metadata. Values stringified so one schema fits every column "
    "type",
)
def maint_stats_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    cols = ("l_quantity", "l_returnflag", "l_shipdate")
    # ONE pass computes every column's stats (ANALYZE semantics): a
    # per-column union re-scans the table once per column. The multi-
    # distinct resolves via one Expand (rows x n_cols in the shuffle)
    # — still one scan, the standard ANALYZE plan. Spark renders
    # timestamp->string with a bare midnight ("2024-01-01 00:00:00")
    # exactly like DuckDB's varchar cast, so plain string casts line
    # up for numerics, strings, and timestamps alike.
    aggs = []
    for col in cols:
        c = F.col(col)
        aggs += [
            F.count(c).alias(f"__nn_{col}"),
            F.countDistinct(c).cast("bigint").alias(f"__ndv_{col}"),
            F.min(c).cast("string").alias(f"__mn_{col}"),
            F.max(c).cast("string").alias(f"__mx_{col}"),
        ]
    wide = li.agg(F.count("*").alias("n_rows"), *aggs)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(col).alias("col_name"),
                    F.col("n_rows").alias("n_rows"),
                    (F.col("n_rows") - F.col(f"__nn_{col}"))
                    .cast("bigint")
                    .alias("n_nulls"),
                    F.col(f"__ndv_{col}").alias("ndv"),
                    F.col(f"__mn_{col}").alias("min_val"),
                    F.col(f"__mx_{col}").alias("max_val"),
                )
                for col in cols
            ]
        )
    )
    return wide.select(rows.alias("s")).select("s.*")


def _interleave_bits(x, y, bits: int):
    """Morton/Z-order interleave of two ``bits``-wide ints as a pure
    column expression: z = x0 y0 x1 y1 ... (x in even positions)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        xbit = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(y, i).bitwiseAND(F.lit(1))
        z = (
            z.bitwiseOR(F.shiftleft(xbit, 2 * i))
            .bitwiseOR(F.shiftleft(ybit, 2 * i + 1))
        )
    return z


def _sql_interleave_bits(x: str, y: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "maint_zorder",
    oracle=f"""
WITH z AS (
  SELECT l_orderkey, l_linenumber,
         l_partkey % 1024 AS px, l_suppkey % 1024 AS sx,
         cast({_sql_interleave_bits('(l_partkey % 1024)',
                                    '(l_suppkey % 1024)', 10)}
              AS bigint) AS zval
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, zval,
       cast(zval // 16384 AS bigint) AS file_bucket
FROM z
""",
    section="B.1",
    notes="Z-order (Morton) clustering key over (partkey, suppkey): "
    "bit-interleaving as a pure codegen expression, plus the derived "
    "file bucket a writer would range-partition on. Data laid out in "
    "zval order gives min/max file-skipping on BOTH key columns at "
    "once -- the multi-dimensional upgrade of scan_partitioned's "
    "single-column pruning. The expression tree is 40 shift/mask ops, "
    "constant-folded per row, no shuffle",
)
def maint_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    px = F.col("l_partkey") % 1024
    sx = F.col("l_suppkey") % 1024
    zval = _interleave_bits(px, sx, 10)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        zval.alias("zval"),
        F.floor(zval / 16384).cast("bigint").alias("file_bucket"),
    )


@query(
    "maint_sorted_layout",
    oracle="""
SELECT event_id, ts, user_id, event_type, value FROM events
""",
    section="B.1",
    notes="write-side clustering: repartition by user_id, sort within "
    "each partition by (user_id, ts), write parquet -- every output "
    "file then holds a contiguous, sorted slice of a few users, so "
    "row-group min/max stats skip files for point and range lookups "
    "on BOTH columns (the poor man's clustered index; Z-order "
    "(maint_zorder) is the multi-dim upgrade). Content is preserved "
    "exactly (the oracle checks that); per-file user disjointness is "
    "asserted in tests/test_plans.py. sortWithinPartitions is a "
    "partition-LOCAL sort: no global range exchange, one shuffle",
)
def maint_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os as _os

    def build(out: str) -> None:
        ev = load(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        (
            ev.repartition(8, "user_id")
            .sortWithinPartitions("user_id", "ts")
            .write.mode("overwrite")
            .parquet(_os.path.join(out, "data"))
        )

    out = materialize(spark, sf_dir, "events_sorted_layout", build)
    return spark.read.parquet(_os.path.join(out, "data"))


@query(
    "maint_partition_overwrite",
    oracle="""
SELECT event_id, user_id, value, nullif(event_type, '') AS event_type
FROM events WHERE event_type <> 'error'
UNION ALL
SELECT event_id, user_id, value * 2 AS value,
       nullif(event_type, '') AS event_type
FROM events WHERE event_type = 'error'
""",
    section="C",
    notes="dynamic partition overwrite (INSERT OVERWRITE semantics): "
    "a hive-partitioned table has ONE partition restated (error "
    "events re-derived with corrected values) via "
    "partitionOverwriteMode=dynamic as a per-WRITE option -- only "
    "partitions present in the incoming frame are replaced, the "
    "rest are untouched on disk, and no session conf leaks. This is "
    "the backfill/restatement primitive of every partitioned lake "
    "table; the doubled value is an exact mantissa-shift so the "
    "read-back hash-matches. Hive partition-value semantics: an "
    "empty-string partition value round-trips as NULL "
    "(__HIVE_DEFAULT_PARTITION__), mirrored by the oracle's nullif. "
    "Re-running the restatement is idempotent (derived from the "
    "source table, not the target)",
)
def maint_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cols = ["event_id", "user_id", "value", "event_type"]

    def build_base(out_: str) -> None:
        (
            load(spark, sf_dir, "events")
            .select(*cols)
            .write.mode("overwrite")
            .partitionBy("event_type")
            .parquet(out_)
        )

    # the _DONE marker lives inside the dir; underscore-prefixed files
    # are invisible to the parquet reader (like _SUCCESS), and the
    # dynamic overwrite below only replaces partition subdirs
    out = materialize(spark, sf_dir, "events_dpo", build_base)
    # the restatement: recompute the 'error' partition from source
    restated = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select(
            "event_id",
            "user_id",
            (F.col("value") * 2).alias("value"),
            "event_type",
        )
    )
    (
        restated.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(out)
    )
    # explicit schema: an empty source writes a partitioned dir with
    # zero part files, which schema inference rejects
    # (tests/test_empty_inputs.py); declaring it is also the 100 TB
    # read discipline
    return spark.read.schema(
        "event_id long, user_id long, value double, event_type string"
    ).parquet(out).select(*cols)


@query(
    "maint_retention_delete",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props FROM events e
WHERE NOT EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = e.user_id AND c.c_acctbal < 0)
""",
    section="B.1",
    notes="right-to-be-forgotten delete on plain parquet: the "
    "forget-list (negative-balance customers here, a DSAR queue in "
    "production) broadcasts to a LEFT ANTI join and the store is "
    "rewritten without the matches — the physical rewrite behind "
    "DELETE in Delta/Iceberg, vs join_anti which only returns the "
    "plan. The forget-list is always broadcast-sized (thousands of "
    "ids vs billions of rows) so the rewrite is one scan with no "
    "shuffle; on the maint_sorted_layout clustering, user_id min/max "
    "file stats let the rewrite skip untouched files entirely",
)
def maint_retention_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = materialize(
        spark,
        sf_dir,
        "events_retention_base",
        lambda o: events_as_micros(spark, sf_dir)
        .write.mode("overwrite")
        .parquet(o),
    )
    out = cache_dir(sf_dir, "events_retention_kept")
    marker = os.path.join(out, "_RDONE")
    if not os.path.exists(marker):
        forget = (
            load(spark, sf_dir, "customer")
            .filter(F.col("c_acctbal") < 0)
            .select(F.col("c_custkey").alias("user_id"))
        )
        kept = spark.read.parquet(base).join(
            F.broadcast(forget), "user_id", "left_anti"
        )
        kept.write.mode("overwrite").parquet(out)
        with open(marker, "w") as f:
            f.write("ok")
    return restore_ts(spark.read.parquet(out)).select(*EVENTS_COLS)


@query(
    "maint_snapshot_expire",
    oracle="""
WITH f AS (
  SELECT DISTINCT event_id % 3000 AS fid FROM events
), refs AS (
  SELECT 'part-' || fid AS path,
         (fid % 10) + cast(r.s AS bigint) AS snap
  FROM f CROSS JOIN range(0, 3) r(s)
  WHERE (fid % 10) + cast(r.s AS bigint) <= 9
)
SELECT path,
       cast(max(snap) AS bigint) AS last_snap,
       cast(count(*) AS bigint) AS n_refs
FROM refs
GROUP BY path
HAVING max(snap) < 7
""",
    section="C",
    notes="snapshot expiry on the manifest alone (keep-last-3 of 10 "
    "snapshots): a file is deletable iff NO retained snapshot "
    "references it, i.e. its newest referencing snapshot is expired "
    "— the reachability rule behind Iceberg/Delta "
    "expire_snapshots/VACUUM. The file-reference log derives "
    "deterministically from events — file id = event_id mod 3000, "
    "born in snapshot fid mod 10, referenced for a 3-snapshot "
    "lifetime (compaction churn), truncated at snapshot 9 — so files "
    "born before snapshot 5 really do expire and the result is "
    "NON-EMPTY at every SF (the r12 derivation kept every file "
    "referenced forever, a 0=0 attestation; VERDICT r12 #5). The "
    "plan is manifest-sized (distinct + one aggregation), never "
    "touches data files, and the HAVING prunes before any output "
    "materializes — at any corpus size this costs what the manifest "
    "costs, which is the point of snapshot metadata",
)
def maint_snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    KEEP_FROM = 7  # retain snapshots 7..9 of 0..9
    ev = load(spark, sf_dir, "events")
    f = ev.select((F.col("event_id") % 3000).alias("fid")).distinct()
    refs = (
        f.crossJoin(
            F.broadcast(
                f.sparkSession.range(0, 3).select(
                    F.col("id").alias("s")
                )
            )
        )
        .select(
            F.concat(F.lit("part-"), F.col("fid").cast("string")).alias(
                "path"
            ),
            ((F.col("fid") % 10) + F.col("s")).alias("snap"),
        )
        # (fid, s) is unique by construction and the lifetime filter
        # keeps snap in range, so refs needs NO dedup shuffle
        .filter(F.col("snap") <= 9)
    )
    return (
        refs.groupBy("path")
        .agg(
            F.max("snap").cast("bigint").alias("last_snap"),
            F.count("*").cast("bigint").alias("n_refs"),
        )
        .filter(F.col("last_snap") < KEEP_FROM)
    )


@query(
    "maint_state_inspect",
    oracle="""
SELECT user_id, cast(count(*) AS bigint) AS n FROM events GROUP BY user_id
""",
    section="C",
    notes="offline state-store inspection (Spark 4 statestore reader): "
    "run a keyed streaming aggregation to completion, then read the "
    "checkpoint's state store AS A DATAFRAME — the operational "
    "debugging primitive for 'what is my streaming job holding in "
    "state' without instrumenting the job. In update mode with no "
    "watermark the state retains every key, so the state contents "
    "equal the batch aggregate exactly and the read oracle-checks; "
    "state partitions load in parallel (one task per state-store "
    "partition), which is how a multi-TB RocksDB state inspects at "
    "scale",
)
def maint_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as _F

    from event_stream_for_k8s_spark.sources.roundtrip import (
        EVENTS_MICROS_SCHEMA,
        restore_ts,
    )

    src = materialize(
        spark,
        sf_dir,
        "events_stream_json",
        lambda out: events_as_micros(spark, sf_dir)
        .coalesce(1)
        .write.mode("overwrite")
        .json(out),
    )
    root = cache_dir(sf_dir, "state_inspect")
    ck = os.path.join(root, "ck")
    # ALWAYS run the stream (no marker short-circuit): with an
    # existing checkpoint the AvailableNow run sees no new files and
    # finishes instantly, and running it registers the session's
    # StateStoreCoordinator — reading format("statestore") in a
    # session where no streaming query ever ran fails with
    # CANNOT_LOAD_STATE_STORE (stale coordinator endpoint)
    stream = restore_ts(
        spark.readStream.schema(EVENTS_MICROS_SCHEMA).json(src)
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            stream.groupBy("user_id")
            .agg(_F.count("*").alias("n"))
            .writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    st = spark.read.format("statestore").load(ck)
    # the value struct carries the operator's internal buffer attribute
    # name (`count` for a count agg), not the query alias — resolve the
    # first buffer field positionally
    buf = st.schema["value"].dataType.names[0]
    return st.select(
        _F.col("key.user_id").alias("user_id"),
        _F.col(f"value.{buf}").cast("bigint").alias("n"),
    )


# (probe_id, shipdate_lo, shipdate_hi_excl, qty_lo_excl, qty_hi_incl)
# NULL bound = unbounded. Predicate semantics: shipdate in [lo, hi)
# AND quantity in (qlo, qhi].
ZONEMAP_PROBES = [
    (1, "1996-01-01", "1997-01-01", None, None),
    (2, None, None, 45.0, None),
    (3, None, "1995-03-01", None, 5.0),
]


def _zone_probe_sql() -> str:
    rows = ", ".join(
        "({}, {}, {}, {}, {})".format(
            pid,
            f"TIMESTAMP '{dlo}'" if dlo else "NULL",
            f"TIMESTAMP '{dhi}'" if dhi else "NULL",
            qlo if qlo is not None else "NULL",
            qhi if qhi is not None else "NULL",
        )
        for pid, dlo, dhi, qlo, qhi in ZONEMAP_PROBES
    )
    return (
        f"SELECT * FROM (VALUES {rows})"
        " AS p(probe_id, dlo, dhi, qlo, qhi)"
    )


@query(
    "maint_prune_zonemap",
    oracle=f"""
WITH zones AS (
  SELECT year(l_shipdate) * 12 + month(l_shipdate) AS file_id,
         cast(count(*) AS bigint) AS n_rows,
         min(l_shipdate) AS sd_min, max(l_shipdate) AS sd_max,
         min(l_quantity) AS q_min, max(l_quantity) AS q_max
  FROM lineitem GROUP BY 1
), probes AS ({_zone_probe_sql()}),
dec AS (
  SELECT p.probe_id, z.file_id, z.n_rows,
         ((p.dlo IS NOT NULL AND z.sd_max < p.dlo)
          OR (p.dhi IS NOT NULL AND z.sd_min >= p.dhi)
          OR (p.qlo IS NOT NULL AND z.q_max <= p.qlo)
          OR (p.qhi IS NOT NULL AND z.q_min > p.qhi)) AS skip
  FROM zones z CROSS JOIN probes p
), matches AS (
  SELECT p.probe_id,
         year(l.l_shipdate) * 12 + month(l.l_shipdate) AS file_id,
         cast(count(*) AS bigint) AS m
  FROM lineitem l CROSS JOIN probes p
  WHERE (p.dlo IS NULL OR l.l_shipdate >= p.dlo)
    AND (p.dhi IS NULL OR l.l_shipdate < p.dhi)
    AND (p.qlo IS NULL OR l.l_quantity > p.qlo)
    AND (p.qhi IS NULL OR l.l_quantity <= p.qhi)
  GROUP BY 1, 2
)
SELECT d.probe_id,
       cast(count(*) AS bigint) AS n_files,
       cast(count(*) FILTER (WHERE d.skip) AS bigint) AS n_skipped,
       cast(coalesce(sum(d.n_rows) FILTER (WHERE NOT d.skip), 0)
            AS bigint) AS scan_rows,
       cast(coalesce(sum(m.m), 0) AS bigint) AS match_rows,
       cast(coalesce(sum(m.m) FILTER (WHERE d.skip), 0) AS bigint)
         AS n_false_skip
FROM dec d LEFT JOIN matches m
  ON m.probe_id = d.probe_id AND m.file_id = d.file_id
GROUP BY d.probe_id
""",
    section="C",
    notes="zone-map (min/max) file pruning as data: per-file stats "
    "(file = l_orderkey div 1000 shard, the maint_stats_collect "
    "output shape) x a probe-predicate relation -> per-probe skip "
    "decisions, scanned-row volume, and — the soundness invariant — "
    "n_false_skip pinned 0: no matching row may live in a skipped "
    "file (same never-under-claim discipline as "
    "join_bloom_membership). This is the planner arithmetic behind "
    "parquet row-group skipping / Delta-Iceberg data skipping; the "
    "zone relation is manifest-sized (one row per file) and the "
    "probe side is a constant-sized broadcast, so the decision join "
    "costs nothing at any corpus size — only the stats build touches "
    "data, once",
)
def maint_prune_zonemap(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # time-clustered ingest layout: one file per ship-month — the
    # layout where shipdate zones are tight (deep pruning on date
    # probes) while quantity zones span the domain (zone maps are
    # useless for the uncorrelated column; probe 2 demonstrates it)
    file_id = (
        F.year("l_shipdate") * 12 + F.month("l_shipdate")
    ).cast("long")
    zones = li.groupBy(file_id.alias("file_id")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("l_shipdate").alias("sd_min"),
        F.max("l_shipdate").alias("sd_max"),
        F.min("l_quantity").alias("q_min"),
        F.max("l_quantity").alias("q_max"),
    )
    probes = spark.createDataFrame(
        [
            (pid, dlo, dhi, qlo, qhi)
            for pid, dlo, dhi, qlo, qhi in ZONEMAP_PROBES
        ],
        "probe_id int, dlo string, dhi string, qlo double, qhi double",
    ).select(
        "probe_id",
        F.col("dlo").cast("timestamp").alias("dlo"),
        F.col("dhi").cast("timestamp").alias("dhi"),
        "qlo",
        "qhi",
    )
    dec = zones.crossJoin(F.broadcast(probes)).select(
        "probe_id",
        "file_id",
        "n_rows",
        (
            (F.col("dlo").isNotNull() & (F.col("sd_max") < F.col("dlo")))
            | (F.col("dhi").isNotNull() & (F.col("sd_min") >= F.col("dhi")))
            | (F.col("qlo").isNotNull() & (F.col("q_max") <= F.col("qlo")))
            | (F.col("qhi").isNotNull() & (F.col("q_min") > F.col("qhi")))
        ).alias("skip"),
    )
    matches = (
        li.crossJoin(F.broadcast(probes))
        .filter(
            (F.col("dlo").isNull() | (F.col("l_shipdate") >= F.col("dlo")))
            & (F.col("dhi").isNull() | (F.col("l_shipdate") < F.col("dhi")))
            & (F.col("qlo").isNull() | (F.col("l_quantity") > F.col("qlo")))
            & (F.col("qhi").isNull() | (F.col("l_quantity") <= F.col("qhi")))
        )
        .groupBy("probe_id", file_id.alias("file_id"))
        .agg(F.count("*").cast("long").alias("m"))
    )
    return (
        dec.join(matches, ["probe_id", "file_id"], "left")
        .groupBy("probe_id")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.count(F.when(F.col("skip"), True))
            .cast("long")
            .alias("n_skipped"),
            F.coalesce(
                F.sum(F.when(~F.col("skip"), F.col("n_rows"))), F.lit(0)
            )
            .cast("long")
            .alias("scan_rows"),
            F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias(
                "match_rows"
            ),
            F.coalesce(F.sum(F.when(F.col("skip"), F.col("m"))), F.lit(0))
            .cast("long")
            .alias("n_false_skip"),
        )
    )


@query(
    "maint_clustering_depth",
    oracle="""
WITH files AS (
  SELECT 'time' AS layout,
         year(l_shipdate) * 12 + month(l_shipdate) AS file_id,
         min(l_shipdate) AS lo, max(l_shipdate) AS hi
  FROM lineitem GROUP BY 1, 2
  UNION ALL
  SELECT 'key', l_orderkey % 16, min(l_shipdate), max(l_shipdate)
  FROM lineitem GROUP BY 1, 2
), depth AS (
  SELECT f.layout, f.file_id, cast(count(*) AS bigint) AS d
  FROM files f JOIN files g
    ON g.layout = f.layout AND g.lo <= f.lo AND f.lo <= g.hi
  GROUP BY 1, 2
)
SELECT layout, cast(count(*) AS bigint) AS n_files,
       round(cast(sum(d) AS double) / count(*), 6) AS avg_depth,
       cast(max(d) AS bigint) AS max_depth
FROM depth GROUP BY layout
""",
    section="C",
    notes="clustering depth on l_shipdate for two physical layouts — "
    "the metric (Snowflake's clustering_depth) that PREDICTS whether "
    "maint_prune_zonemap can skip: depth(file) = how many same-layout "
    "file intervals overlap the file's min point; avg ~1 = "
    "well-clustered (time-sharded layout, zone maps prune deeply), "
    "avg ~ n_files = unclustered (round-robin orderkey layout, every "
    "file spans the domain, zone maps prune nothing). This is what "
    "tells a table service WHEN to trigger maint_zorder / "
    "maint_sorted_layout. The interval join is all-pairs ON THE "
    "MANIFEST — dozens of metadata rows, never data rows, so the "
    "quadratic is bounded by file count per partition in any real "
    "deployment (and a line-sweep window replaces it past ~1e5 "
    "files)",
)
def maint_clustering_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    by_time = li.groupBy(
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("file_id")
    ).agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).select(F.lit("time").alias("layout"), "file_id", "lo", "hi")
    by_key = li.groupBy(
        (F.col("l_orderkey") % 16).cast("long").alias("file_id")
    ).agg(
        F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi")
    ).select(F.lit("key").alias("layout"), "file_id", "lo", "hi")
    files = by_time.unionAll(by_key).transform(query_persist)
    f = files.alias("f")
    g = files.alias("g")
    depth = (
        f.join(
            F.broadcast(g),
            (F.col("g.layout") == F.col("f.layout"))
            & (F.col("g.lo") <= F.col("f.lo"))
            & (F.col("f.lo") <= F.col("g.hi")),
        )
        .groupBy(F.col("f.layout").alias("layout"), F.col("f.file_id"))
        .agg(F.count("*").cast("long").alias("d"))
    )
    return depth.groupBy("layout").agg(
        F.count("*").cast("long").alias("n_files"),
        F.round(F.sum("d").cast("double") / F.count("*"), 6).alias(
            "avg_depth"
        ),
        F.max("d").cast("long").alias("max_depth"),
    )


@query(
    "maint_deletion_vectors",
    oracle="""
WITH pos AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         l_orderkey % 64 AS file_id,
         row_number() OVER (PARTITION BY l_orderkey % 64
            ORDER BY l_orderkey, l_linenumber) - 1 AS pos
  FROM lineitem
), dv AS (
  SELECT file_id, pos FROM pos
  WHERE (l_orderkey + l_linenumber) % 10 < 2
), live AS (
  SELECT p.file_id, p.l_quantity FROM pos p LEFT JOIN dv
    ON dv.file_id = p.file_id AND dv.pos = p.pos
  WHERE dv.file_id IS NULL
), tot AS (
  SELECT l_orderkey % 64 AS file_id, cast(count(*) AS bigint) AS n_rows
  FROM lineitem GROUP BY 1
), liv AS (
  SELECT file_id, cast(count(*) AS bigint) AS n_live,
         cast(sum(cast(round(l_quantity) AS bigint)) AS bigint)
           AS live_qty
  FROM live GROUP BY file_id
)
SELECT t.file_id, t.n_rows,
       t.n_rows - coalesce(l.n_live, 0) AS n_deleted,
       coalesce(l.n_live, 0) AS n_live,
       coalesce(l.live_qty, 0) AS live_qty
FROM tot t LEFT JOIN liv l ON t.file_id = l.file_id
""",
    section="B.1",
    notes="deletion-vector merge-on-read (the Delta/Iceberg v2 "
    "POSITION delete, vs maint_retention_delete's key-based rewrite): "
    "deletes name (file, row_position) pairs, so the read path is the "
    "base scan LEFT ANTI the broadcast DV set on (file_id, pos) -- no "
    "rewrite, no key columns touched; the summary emits per-file "
    "live/deleted counts plus a live-rows checksum. The fixture "
    "SYNTHESIZES positions with a per-file window (deterministic, so "
    "the oracle can replay it); a production scan gets the position "
    "free from the reader (_metadata.row_index) and the DV side is a "
    "per-file roaring bitmap a few KB wide -- always broadcast-sized, "
    "one scan, zero shuffle beyond the summary agg",
)
def maint_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = load(spark, sf_dir, "lineitem")
    fid = (F.col("l_orderkey") % 64).alias("file_id")
    w = Window.partitionBy("file_id").orderBy("l_orderkey", "l_linenumber")
    pos = li.select(
        "l_orderkey", "l_linenumber", "l_quantity", fid
    ).withColumn("pos", F.row_number().over(w) - 1)
    dv = pos.filter(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 10 < 2
    ).select("file_id", "pos")
    live = pos.join(F.broadcast(dv), ["file_id", "pos"], "left_anti")
    tot = li.groupBy(fid).agg(F.count("*").cast("long").alias("n_rows"))
    liv = live.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_live"),
        F.sum(F.round(F.col("l_quantity")).cast("long"))
        .cast("long")
        .alias("live_qty"),
    )
    return tot.join(liv, "file_id", "left").select(
        "file_id",
        "n_rows",
        (F.col("n_rows") - F.coalesce(F.col("n_live"), F.lit(0))).alias(
            "n_deleted"
        ),
        F.coalesce(F.col("n_live"), F.lit(0)).alias("n_live"),
        F.coalesce(F.col("live_qty"), F.lit(0)).alias("live_qty"),
    )
