"""Query-scope cache ownership (r16, VERDICT r15 #5 / wrong #2).

Query functions persist twice-referenced intermediates (signature
relations, histograms, ranked self-join sides …) that must stay
cached until the RETURNED lazy DataFrame is materialized — so the
query function itself can never unpersist them. Before r16 those
handles were simply dropped: every invocation leaked a cached
relation for the session lifetime, and only harnesses that happened
to call ``spark.catalog.clearCache()`` between queries (bench.py)
stayed bounded; a long-lived session executing many registry queries
(the selfcheck sweep, a serving daemon) accumulated cached blocks
until memory pressure evicted them.

The convention:

- plan/operator code calls :func:`query_persist` instead of bare
  ``DataFrame.persist`` for any cache whose lifetime outlives the
  function that created it (self-managed caches that the creator
  unpersists in a ``finally`` — e.g. the BPE trainer's round
  relations — stay bare);
- the EXECUTING harness calls :func:`release_query_caches` after
  materializing each query's result (tools/selfcheck.py,
  tests/test_cache_hygiene.py pin it; bench.py keeps its
  clearCache-per-query, which releases the same blocks);
- operators that additionally expose their cache to callers for
  EARLY release keep attaching it as ``result.cached_input`` (the
  ADVICE r08/r09 contract) — an early ``unpersist()`` there is a
  no-op at release time.

This is surgical where ``spark.catalog.clearCache()`` is global: the
registry releases only the caches the engine's own query functions
created, never a caller's persisted DataFrames sharing the session.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def query_persist(
    df: DataFrame, level: StorageLevel | None = None
) -> DataFrame:
    """``df.persist(level)`` plus registration in the query-scope
    cache registry. Returns the persisted DataFrame. ``level=None``
    uses ``DataFrame.persist()``'s default storage level."""
    df = df.persist(level) if level is not None else df.persist()
    _LIVE.append(df)
    return df


def live_query_caches() -> int:
    """Number of registered, not-yet-released cache handles."""
    return len(_LIVE)


def release_query_caches() -> int:
    """Unpersist every registered query-scope cache (blocking=False:
    eviction proceeds asynchronously, the registry is cleared now).
    Call AFTER materializing the query result that uses them —
    releasing earlier is safe but recomputes. Returns the number of
    handles released. Idempotent; tolerates a stopped session."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # noqa: BLE001 — stopped session / dead JVM
            pass
    return n
