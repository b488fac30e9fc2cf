#!/usr/bin/env python
"""Benchmark harness (BASELINE.md protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], 1 warm-up + median
of $BENCH_RUNS (default 3) timed runs per query, executing each plan
fully through the ``noop`` sink (no driver collection, no pruning of
the measured work). Prints exactly ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from event_stream_for_k8s_spark.caching import (  # noqa: E402
    release_query_caches,
)
from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.plans.llm import effective_caps  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # reference-parity hot path
    "flagship_dedup_count",
    "k8s_envelope_multidim_count",
    "stream_dedup_ttl",
    # relational core
    "agg_hash",
    "agg_multidim",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "topk_per_group",
    # LLM pipeline
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_knn_brute",
    "llm_text_tfidf",
    "llm_fingerprint",
    "llm_quality",
    # post-r1 families (VERDICT r13 #6): one representative each so
    # the recorded bench tracks what the engine has become — media
    # signatures, the trainer tier, and the production ANN shape.
    # Baseline-v2 rows for these were recorded the same session the
    # set changed (BASELINE.md r14 block), keeping the gate
    # like-for-like.
    "llm_mm_phash",
    "llm_bpe_encode_docs",
    "llm_knn_ivfpq",
    # r15 refresh (VERDICT r14 #6): the r14 production-relevant
    # additions join the headline — the SQ8 memory tier and FastCDC
    # sub-document chunking. Baseline-v2 rows recorded the same
    # session the set changed (BASELINE.md r15 block).
    "llm_knn_sq8",
    "llm_dedup_chunks_cdc",
]


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = REGISTRY[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    # optional subset for the soak tools (r16): same methodology over
    # named queries. The driver's invocation sets no BENCH_QUERIES, so
    # its bench is byte-identical to prior rounds.
    names = HEADLINE
    if os.environ.get("BENCH_QUERIES"):
        names = [
            n.strip()
            for n in os.environ["BENCH_QUERIES"].split(",")
            if n.strip()
        ]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    colds: dict[str, float] = {}
    for name in names:
        try:
            # the warm-up run IS the query's first execution in this
            # session: record it as the COLD number (r16, VERDICT r15
            # #3 — the timed median can be served partly from the
            # warm-up's persisted intermediates via CacheManager plan
            # matching, so persist-based wins look larger warm than
            # cold; reporting both keeps the median comparable with
            # every prior round while exposing the true cold cost).
            colds[name] = round(run_once(spark, name, sf_dir), 3)
            timings[name] = round(
                statistics.median(run_once(spark, name, sf_dir) for _ in range(runs)),
                3,
            )
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
        finally:
            # plans persist() intermediates; without a clear between
            # queries every query's cached blocks accumulate for the
            # session and distort later timings (ADVICE r02). Within a
            # query, warm runs may still hit the CacheManager (same
            # logical plan) — intentional, matches prior rounds.
            # r16: also drop the tracked query-scope cache handles
            # (caching.py) so the registry list stays bounded; the
            # clearCache already evicted their blocks.
            release_query_caches()
            spark.catalog.clearCache()
    total = round(sum(t for t in timings.values() if t >= 0), 3)
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # additions-only (r16): first-run-per-session seconds;
                # "value" and "queries" stay the warm medians, so
                # round-over-round comparisons are unaffected
                "queries_cold": colds,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # effective scale-cap knobs (ADVICE r06): results
                # recorded under different caps must be distinguishable
                "env_caps": effective_caps(),
            }
        )
    )


if __name__ == "__main__":
    main()
