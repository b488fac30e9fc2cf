"""The reference daemon, assembled (``src/main.rs``).

The reference binary wires four tasks: a cluster-wide Event watcher
(``main.rs:68``), a writer that dedups against the sled cache and
prints each new event as one NDJSON line (``tasks.rs:66-148``), a TTL
cache cleaner (``tasks.rs:184-224``), and a Prometheus exporter on
``0.0.0.0:9000`` (``main.rs:63``), with SIGTERM/SIGINT broadcast
shutdown (``main.rs:70-80``). Configuration comes from the
environment (``config.rs``: ``CACHE_TTL`` default 3600, ``CACHE_DB``
default ``events-db``).

This module assembles the same daemon from the engine's parts, each
mapped Spark-first:

| reference task | here |
|---|---|
| kube watcher + backoff | `K8sWatchSpooler.run_with_reconnect` in a daemon thread, spooling NDJSON that the partition-capable `k8s-events` source serves to executors |
| sled cache + writer | `dedup_within_ttl` (watermark-bounded `dropDuplicatesWithinWatermark`; the checkpointed state store IS the cache db) + foreachBatch NDJSON emit |
| cache cleaner | watermark state eviction (no separate task needed) |
| prometheus_exporter | `K8sStreamMetrics` + `ExpositionServer` |
| SIGTERM/SIGINT handling | `signal` -> `StreamingQuery.stop()` (graceful: the current batch commits, then the query ends) |

Env config (reference names kept where they exist):
  CACHE_TTL      dedup TTL seconds (default 3600, config.rs:11)
  CACHE_DB       checkpoint directory (default ./events-db)
  KES_SPOOL      spool directory (default ./kes-spool)
  KES_API_URL    k8s API base URL; if unset, the spool is expected to
                 be appended by an external collector (file-tail mode)
  KES_NAMESPACE  optional namespace scope for the watch
  METRICS_PORT   exposition port (default 9000, main.rs:63)
  METRICS_HOST   exposition bind address (default 0.0.0.0, as the
                 reference binds — a pod-IP scrape must reach it)

Scale note: stdout NDJSON mirrors the reference's emit
(``tasks.rs:105``) and streams through ``toLocalIterator`` (one
partition at a time on the driver — the print point is inherently a
single process). A cluster deployment passes ``emit=None`` and a
``sink_dir`` instead, which writes NDJSON from executors.
"""

from __future__ import annotations

import logging
import os
import signal
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_stream_for_k8s_spark.streaming.dedup_pipeline import (
    dedup_within_ttl,
)
from event_stream_for_k8s_spark.streaming.prom_metrics import (
    ExpositionServer,
    K8sStreamMetrics,
)

log = logging.getLogger(__name__)


class DaemonConfig:
    """config.rs twin — env with defaults, read eagerly at start."""

    def __init__(self, env=os.environ):
        self.cache_ttl = int(env.get("CACHE_TTL", "3600"))
        self.cache_db = env.get("CACHE_DB", "events-db")
        self.spool_dir = env.get("KES_SPOOL", "kes-spool")
        self.api_url = env.get("KES_API_URL")
        self.namespace = env.get("KES_NAMESPACE")
        self.metrics_port = int(env.get("METRICS_PORT", "9000"))
        self.metrics_host = env.get("METRICS_HOST", "0.0.0.0")


def _keyed_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Spool -> keyed envelope stream.

    The ``k8s-events`` source extracts the reference's field set as
    FLAT string columns on executors (k8s_datasource._to_batch); this
    builds from that projection: A4 timestamp precedence
    (types.rs:40-51, falling back to now() exactly as the reference
    does for timestamp-less events), the A5 ``uid:resourceVersion``
    key with ``''`` for missing parts, the 4-dim label columns with
    ``'-'`` defaults (tasks.rs:109-121), and the {time,
    kubernetes_event} envelope (types.rs:10-18) the NDJSON emit
    serializes.
    """
    from event_stream_for_k8s_spark.operators.dedup import dedup_key
    from event_stream_for_k8s_spark.sources.k8s_datasource import register

    register(spark)
    raw = (
        spark.readStream.format("k8s-events")
        .option("path", os.path.join(spool_dir, "watch.jsonl"))
        .load()
    )
    ts = lambda c: F.col(c).cast("timestamp")  # noqa: E731 (ISO8601)
    # the reference serializes the FULL nested k8s Event (types.rs:
    # 10-18: metadata.uid, involvedObject.{kind,name,namespace},
    # count, source.component, ...); rebuild that shape from the
    # source's flat projection so NDJSON consumers keying on any of
    # those fields (ADVICE r05: involvedObject.name in particular)
    # parse ours unchanged. to_json drops null fields, matching
    # serde's Option-skipping — an Event without source/count omits
    # them here too.
    nested_event = F.struct(
        F.struct(
            F.col("uid").alias("uid"),
            F.col("resource_version").alias("resourceVersion"),
            F.col("meta_namespace").alias("namespace"),
            F.col("creation_timestamp").alias("creationTimestamp"),
        ).alias("metadata"),
        F.struct(
            F.col("kind").alias("kind"),
            F.col("obj_name").alias("name"),
            F.col("namespace").alias("namespace"),
        ).alias("involvedObject"),
        F.col("type").alias("type"),
        F.col("reason").alias("reason"),
        F.col("message").alias("message"),
        F.col("count").cast("int").alias("count"),
        F.when(
            F.col("source_component").isNotNull(),
            F.struct(F.col("source_component").alias("component")),
        ).alias("source"),
        F.col("first_timestamp").alias("firstTimestamp"),
        F.col("last_timestamp").alias("lastTimestamp"),
    )
    return raw.select(
        F.coalesce(
            ts("last_timestamp"),
            ts("first_timestamp"),
            ts("creation_timestamp"),
            F.current_timestamp(),
        ).alias("time"),
        nested_event.alias("kubernetes_event"),
        dedup_key([F.col("uid"), F.col("resource_version")]).alias("k"),
        F.coalesce(F.col("type"), F.lit("-")).alias("etype"),
        F.coalesce(F.col("reason"), F.lit("-")).alias("ereason"),
        F.coalesce(F.col("kind"), F.lit("-")).alias("ekind"),
        F.coalesce(F.col("namespace"), F.lit("-")).alias("ens"),
    )


def _stop_on_watch_exit(state: dict) -> None:
    """select_all shutdown (main.rs:75), race-free and idempotent:
    called by the watch thread after it sets ``watch_done`` AND by the
    starter after it publishes ``query`` — whichever runs second sees
    both writes, and the ``stop_lock`` makes the stopped test-and-set
    atomic so exactly ONE caller performs the drain-and-stop (ADVICE
    r05: the bare check-then-set let both enter and interleave
    processAllAvailable()/stop()). A bounded watch that completed
    normally drains the spooled events through the stream before
    stopping; a fatal exit stops immediately."""
    q = state.get("query")
    if q is None or not state["watch_done"].is_set():
        return
    with state["stop_lock"]:
        if state.get("stopped"):
            return
        state["stopped"] = True
    try:
        if state.get("watch_ok"):
            q.processAllAvailable()
        q.stop()
    except Exception:  # noqa: BLE001 - best-effort teardown
        pass


def run_daemon(
    spark: SparkSession,
    config: DaemonConfig | None = None,
    emit=print,
    sink_dir: str | None = None,
    available_now: bool = False,
    install_signal_handlers: bool = True,
    spool_max_events: int | None = None,
):
    """Assemble and run the daemon; returns (query, metrics, server).

    ``available_now=True`` gives the bounded batch-catch-up mode
    (tests, replay); the default runs continuously until a signal.
    ``emit`` receives each NDJSON line driver-side (the reference's
    stdout contract); pass ``emit=None`` with ``sink_dir`` to write
    NDJSON from executors instead (the cluster deployment shape).
    """
    cfg = config or DaemonConfig()
    os.makedirs(cfg.spool_dir, exist_ok=True)
    spool_path = os.path.join(cfg.spool_dir, "watch.jsonl")
    # set after the query starts; the continuous-mode watch thread
    # reads it to shut the daemon down if the watch loop dies
    _daemon_state: dict = {
        "query": None,
        "watch_done": threading.Event(),
        "watch_ok": False,
        "stopped": False,
        "stop_lock": threading.Lock(),
    }
    watch_thread: threading.Thread | None = None

    if cfg.api_url:
        from event_stream_for_k8s_spark.sources.k8s_watch_http import (
            K8sWatchSpooler,
        )

        spooler = K8sWatchSpooler(
            cfg.api_url, spool_path, namespace=cfg.namespace
        )
        if available_now:
            # bounded replay: the catch-up pull must COMPLETE before
            # the one-shot stream lists its input, or the run silently
            # truncates. With a max_events bound, wait for the thread
            # and fail loudly on timeout; without one, do a single
            # synchronous LIST+WATCH-to-EOF pull (spooler.run) instead
            # of the endless reconnect loop.
            if spool_max_events is None:
                spooler.run()
            else:
                spooler_thread = threading.Thread(
                    target=lambda: spooler.run_with_reconnect(
                        max_events=spool_max_events
                    ),
                    daemon=True,
                    name="kes-watch-spooler",
                )
                spooler_thread.start()
                spooler_thread.join(timeout=120)
                if spooler_thread.is_alive():
                    raise TimeoutError(
                        "watch catch-up did not reach "
                        f"{spool_max_events} events within 120s; "
                        "raise the timeout or lower the bound"
                    )
        else:
            # main.rs:75 parity (select_all): when ANY task ends, the
            # whole daemon shuts down. If the watch loop dies — a
            # fatal 401/403/404 raises out of run_with_reconnect — the
            # query must stop too, not keep running against a spool
            # that will never grow again. A bounded watch that ends
            # NORMALLY first drains the spooled events through the
            # stream before stopping (the available_now path gets the
            # same guarantee by joining the spooler pre-start).
            # Handoff is race-free: the thread SETS watch_done before
            # reading the query slot, the starter PUBLISHES the query
            # before checking watch_done — whichever side loses the
            # race still observes the other's write (_stop_on_watch_
            # exit is idempotent).
            def _spool_loop() -> None:
                ok = False
                try:
                    spooler.run_with_reconnect(max_events=spool_max_events)
                    ok = True
                except Exception:  # noqa: BLE001 - shutdown IS the handling
                    # the watch module already logged the specific
                    # failure; stopping the daemon below is the
                    # select_all response, so don't re-raise into an
                    # unhandlable thread exception
                    log.exception("watch loop died; stopping the daemon")
                finally:
                    _daemon_state["watch_ok"] = ok
                    _daemon_state["watch_done"].set()
                    _stop_on_watch_exit(_daemon_state)

            watch_thread = threading.Thread(
                target=_spool_loop,
                daemon=True,
                name="kes-watch-spooler",
            )
            watch_thread.start()
    elif not os.path.exists(spool_path):
        # file-tail mode: the collector appends; start from empty
        open(spool_path, "a").close()

    metrics = K8sStreamMetrics()
    server = ExpositionServer(
        metrics.registry, port=cfg.metrics_port, host=cfg.metrics_host
    )
    server.start()

    # `total`/`cache_hits` count EVERY received event (duplicates
    # included, tasks.rs:132-140), so the received count is observed
    # PRE-dedup; the post-dedup sink records the misses and the two
    # are reconciled per batch_id (prom_metrics.sync_received).
    keyed = _keyed_stream(spark, cfg.spool_dir).observe(
        "kes_received", F.count(F.lit(1)).alias("n")
    )
    deduped = dedup_within_ttl(
        keyed, key_col="k", time_col="time", ttl_seconds=cfg.cache_ttl
    ).observe("kes_emitted", F.count(F.lit(1)).alias("n"))

    def sink(batch: DataFrame, batch_id: int) -> None:
        # metrics first (aggregates only reach the driver), then the
        # NDJSON emit — same per-batch order as the reference's
        # writer loop (count, print, commit; tasks.rs:95-131)
        metrics.observe_batch(
            batch,
            key_col="k",
            order_cols=("time",),
            type_col="etype",
            reason_col="ereason",
            kind_col="ekind",
            namespace_col="ens",
            defer_totals_batch_id=batch_id,
        )
        lines = batch.select(
            F.to_json(F.struct("time", "kubernetes_event")).alias("line")
        )
        both = emit is not None and sink_dir is not None
        if both:
            # don't recompute the batch for the second consumer
            lines = lines.persist()
        try:
            if emit is not None:
                for row in lines.toLocalIterator():
                    emit(row["line"])
            if sink_dir is not None:
                lines.write.mode("append").text(sink_dir)
        finally:
            if both:
                lines.unpersist()

    writer = (
        deduped.writeStream.foreachBatch(sink)
        .option("checkpointLocation", cfg.cache_db)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    _daemon_state["query"] = query
    if _daemon_state["watch_done"].is_set():
        # the watch loop ended before the query was published (e.g. a
        # fatal auth error on the first connect) — don't zombie; the
        # helper is idempotent with the thread's own call
        _stop_on_watch_exit(_daemon_state)

    # received-count reconciliation: progress (with the kes_received
    # observation) is emitted after each batch commits; a light poll
    # keeps the scrape endpoint's total/hit counters current, with a
    # final flush when the query ends. sync_from_query is idempotent
    # per batch_id, so callers may also invoke it directly (tests do,
    # for determinism after awaitTermination).
    def _sync_loop() -> None:
        import time as _time

        while query.isActive:
            metrics.sync_from_query(query)
            _time.sleep(0.5)
        metrics.sync_from_query(query)

    threading.Thread(
        target=_sync_loop, daemon=True, name="kes-metrics-sync"
    ).start()

    if install_signal_handlers and not available_now:
        # main.rs:70-80: first signal requests a graceful stop (the
        # in-flight batch commits); the handler then restores the
        # DEFAULT disposition, so a second signal escalates to
        # process termination if the stop hangs
        def _stop(signum, frame):
            signal.signal(signum, signal.SIG_DFL)
            query.stop()

        signal.signal(signal.SIGTERM, _stop)
        signal.signal(signal.SIGINT, _stop)

    return query, metrics, server


def main() -> None:  # pragma: no cover - thin CLI shim
    from event_stream_for_k8s_spark.session import get_spark

    spark = get_spark("event-stream-for-k8s")
    query, _, server = run_daemon(spark)
    try:
        query.awaitTermination()
    finally:
        server.stop()


if __name__ == "__main__":  # pragma: no cover
    main()
