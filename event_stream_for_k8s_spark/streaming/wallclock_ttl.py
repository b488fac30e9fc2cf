"""Exact wall-clock-TTL dedup parity (SURVEY.md §3.4.4).

The watermark pipeline (dedup_pipeline.py) expresses the reference's
TTL in EVENT time. The reference itself uses WALL-CLOCK seconds
(``src/tasks.rs:126,190``: sled values are epoch-seconds written on
cache miss, purged by a 5 s GC sweep when ``ts + CACHE_TTL < now``).
When exact parity matters, this operator stores the wall-clock
last-seen epoch in keyed state and expires it LAZILY on the next
probe — emission-equivalent to the reference's probe+GC pair:

- first sight of a key -> emit, store now();
- re-delivery with ``now - stored < ttl`` -> suppressed (cache hit;
  like the reference, a hit does NOT refresh the timestamp —
  tasks.rs:124-127 only stages inserts for misses);
- re-delivery past the TTL -> state refreshed, row re-emitted
  (tasks.rs:196-199 re-emission).

Lazy expiry means untouched keys linger in state until probed; at
scale pair this with the state-store's native TTL/cleanup rather than
processing-time timers — timers keep an AvailableNow drain alive
until every timer has fired, which turns a finite backfill run into a
wall-clock wait.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_wallclock_ttl(
    keyed: DataFrame,
    ttl_seconds: int,
    payload_cols: tuple[str, ...] = ("reason",),
) -> DataFrame:
    """``keyed`` must have a ``dedup_key`` column plus ``payload_cols``.
    Emits the first-seen row per key per wall-clock-TTL window."""
    out_schema = "dedup_key string, " + ", ".join(
        f"{c} string" for c in payload_cols
    )

    def proc(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        now = int(time.time())
        if state.exists:
            (last_seen,) = state.get
            if now - last_seen < ttl_seconds:
                return  # cache hit: suppressed (tasks.rs:98-101)
        state.update((now,))
        if first is not None:
            yield pd.DataFrame(
                {
                    "dedup_key": [key[0]],
                    **{c: [first[c].iloc[0]] for c in payload_cols},
                }
            )

    return keyed.groupBy("dedup_key").applyInPandasWithState(
        proc,
        outputStructType=out_schema,
        stateStructType="last_seen bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
