"""Query-scope cache ownership (r16, VERDICT r15 #5 / wrong #2).

Query functions persist twice-referenced intermediates that must
outlive the function (the returned DataFrame still reads them), so
they register the handles in ``caching.query_persist`` and the
EXECUTING harness releases them after materializing each result. A
long-lived session running many registry queries must therefore show
BOUNDED storage growth: every cached block a query created is gone
after its release call, not accumulated for the session lifetime.
"""

from __future__ import annotations

from event_stream_for_k8s_spark.caching import (
    live_query_caches,
    release_query_caches,
)
from event_stream_for_k8s_spark.plans import REGISTRY

from .conftest import SF_SMOKE

# queries whose plans persist intermediates (signature relations,
# BPE histograms, chunk signatures, per-term tf) — the classes the
# r15 audit flagged as never-unpersisted
PERSISTING = [
    "llm_dedup_near",
    "llm_dedup_chunks_cdc",
    "llm_bpe_encode_docs",
    "llm_bpe_pack",
    "llm_mm_dedup_phash",
]


def _cached_rdds(spark) -> int:
    """Number of RDDs holding cached blocks right now (the JVM's
    getRDDStorageInfo lists only RDDs with materialized cached
    partitions)."""
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_persisted_pipeline_queries_release_bounded(spark):
    """N persisted-pipeline queries in ONE session: each query's
    tracked caches materialize during execution and are fully
    released afterward — storage returns to the session baseline
    after every query instead of growing per invocation."""
    release_query_caches()  # drop anything earlier tests tracked
    spark.catalog.clearCache()
    baseline = _cached_rdds(spark)
    for _ in range(2):  # repeat invocations must not accumulate
        for name in PERSISTING:
            df = REGISTRY[name].spark(spark, SF_SMOKE)
            df.write.format("noop").mode("overwrite").save()
            assert live_query_caches() > 0, (
                f"{name} registered no query-scope cache — if its "
                "persist was removed, drop it from PERSISTING"
            )
            released = release_query_caches()
            assert released > 0
            assert live_query_caches() == 0
            assert _cached_rdds(spark) <= baseline, (
                f"cached RDDs grew past the session baseline after "
                f"releasing {name}"
            )


def test_release_is_idempotent_and_safe_before_materialization(spark):
    """Releasing twice is a no-op; releasing BEFORE the result
    materializes is safe (the plan recomputes, results unchanged)."""
    release_query_caches()
    df = REGISTRY["llm_dedup_chunks_cdc"].spark(spark, SF_SMOKE)
    assert release_query_caches() > 0  # released pre-materialization
    assert release_query_caches() == 0  # idempotent
    assert df.count() > 0  # still computes correctly, just uncached
    release_query_caches()
