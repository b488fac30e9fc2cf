"""Wall-clock-TTL dedup on transformWithStateInPandas (Spark >= 4.0).

Same contract as :mod:`wallclock_ttl` (the applyInPandasWithState
variant) but on Spark 4's successor stateful API, which adds the two
things the old API lacked for the reference's semantics
(``src/tasks.rs:95-130`` probe + ``src/tasks.rs:184-229`` GC sweep):

- **native state TTL** (``getValueState(..., ttlDurationMs=...)``):
  the state store itself expires entries a wall-clock TTL after their
  last *write* — and since a cache hit does not rewrite the value
  (mirroring the reference, whose hits never refresh the sled entry,
  ``tasks.rs:124-127``), expiry lands exactly ``CACHE_TTL`` after
  first sight. This is the reference's 5 s full-scan GC
  (``tasks.rs:193-200``) done natively and incrementally — O(expired),
  not O(all keys), which is the 100 TB-state answer.
- a manual ``now - last_seen < ttl`` probe guard on top, because TTL
  eviction granularity is the micro-batch: a key probed *within* the
  batch where its TTL lapsed must still re-emit (``tasks.rs:196-199``).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``)
— transformWithState is not implemented for the HDFS-backed provider,
and RocksDB is the provider you would run at scale anyway. Also
requires the ``protobuf`` Python package at runtime (the PySpark<->JVM
state-server protocol is proto-based); absent in this image, so the
end-to-end test skips and :mod:`wallclock_ttl` (same contract on
``applyInPandasWithState``, no extra deps) is the exercised path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


class TtlDedupProcessor(StatefulProcessor):
    """First sight of a key emits; re-deliveries inside the wall-clock
    TTL are suppressed; past it the key re-emits (state refreshed)."""

    def __init__(self, ttl_seconds: int, payload_cols: tuple[str, ...]):
        self._ttl_ms = ttl_seconds * 1000
        self._payload_cols = payload_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._last_seen = handle.getValueState(
            "last_seen", "last_seen BIGINT", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        first: pd.DataFrame | None = None
        for pdf in rows:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        now_ms = timerValues.getCurrentProcessingTimeInMs()
        if self._last_seen.exists():
            (last_ms,) = self._last_seen.get()
            if now_ms - last_ms < self._ttl_ms:
                return  # cache hit: suppressed (tasks.rs:98-101)
        self._last_seen.update((now_ms,))
        if first is not None:
            yield pd.DataFrame(
                {
                    "dedup_key": [key[0]],
                    **{
                        c: [first[c].iloc[0]] for c in self._payload_cols
                    },
                }
            )

    def handleExpiredTimer(
        self,
        key: tuple,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        return iter(())  # eviction is the state TTL's job; no timers used

    def close(self) -> None:
        pass


def dedup_wallclock_ttl_tws(
    keyed: DataFrame,
    ttl_seconds: int,
    payload_cols: tuple[str, ...] = ("reason",),
) -> DataFrame:
    """``keyed`` must have a ``dedup_key`` column plus ``payload_cols``
    (all strings). Emits the first-seen row per key per TTL window."""
    out_schema = "dedup_key string, " + ", ".join(
        f"{c} string" for c in payload_cols
    )
    return keyed.groupBy("dedup_key").transformWithStateInPandas(
        statefulProcessor=TtlDedupProcessor(ttl_seconds, payload_cols),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
