#!/usr/bin/env python
"""Next-decade scaling soak: sf1 vs sf10 (VERDICT r11 "Next round" #1).

Same protocol as soak_sf1.py one decade up: each query runs twice at
sf1 (min = warm time; the first run pays one-time fixture builds) and
once at sf10; a flagged ratio is re-run once before it counts
(sf10-side fixture builds are also one-time). The declared threshold
stays 14x for a 10x data step: a linear plan on a fixed 32-core box
is <= 10x plus fixed overhead; a ratio beyond 14 means the plan's
work grew superlinearly in the data — the llm_winnow-class failure.

Default query set = the worst sf1 shapes from BASELINE.md's r11 soak
table (win_rank, join_fuzzy_blocked, the BPE family, clusters_lsh,
stream_dedup_ttl, the graph queries) plus the late-r11 additions —
the set VERDICT r11 prescribed for the missing decade.

Prereq: python tools/make_sf1.py && python tools/make_sf10.py
Usage:  SPARK_GRAFT_DRIVER_MEM=48g python tools/soak_sf10.py [names...]
Writes one JSON line per query, a summary line; exit 1 on any flag.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1 = os.path.join(_ROOT, ".data_cache", "sf1")
SF10 = os.path.join(_ROOT, ".data_cache", "sf10")

# the prescribed decade set: every >3x sf1 shape + the r11 late adds
DEFAULT = [
    "win_rank",
    "join_fuzzy_blocked",
    "llm_bpe_train",
    "llm_bpe_encode",
    "llm_bpe_encode_docs",
    "llm_bpe_pack",
    "llm_dedup_clusters_lsh",
    "stream_dedup_ttl",
    "graph_triangles",
    "graph_jaccard",
    "llm_sft_pipeline",
    "llm_sft_loss_mask",
    "llm_dedup_excise",
    "llm_knn_ivfpq",
    "stream_doc_dedup",
    "llm_dedup_near",
    "flagship_dedup_count",
    "join_inner_hash",
    "agg_multidim",
    "llm_text_tfidf",
]


# Declared-anchor thresholds: win_rank is the registry's ONE
# deliberate global-window exemplar (B.5 anchor, SCALE WARNING +
# keyed twins in its notes). Its work is linear but its parallelism
# is pinned at 3 by SEMANTICS (rank over 3 return flags), so the
# expected sf1->sf10 ratio is ~the data ratio (10x) plus the larger
# sort/spill constant — the generic 14x keyed-plan threshold would
# flag the anchor for behaving exactly as documented. 20x = data
# ratio x2 headroom; the ratio still prints either way. Slicing the
# anchor instead (the clusters precedent) was rejected because
# win_rank is a frozen BASELINE v2 bench row — shrinking its input
# would game the bench gate.
ANCHOR_THRESHOLD = {"win_rank": 20.0}


def run_once(spark, name: str, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.time()
    df = REGISTRY[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threshold", type=float, default=14.0)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT

    # sf10 shuffles carry 10x sf1 bytes: widen the shuffle so each
    # partition stays executor-comfortable (the cluster knob SURVEY
    # §4.2 prescribes; AQE coalesces the excess at the small SF)
    spark = get_spark("soak_sf10", shuffle_partitions=64)
    bad = []
    results = {}
    for name in names:
        thresh = ANCHOR_THRESHOLD.get(name, args.threshold)
        t_small = run_once(spark, name, SF1)
        t_small = min(t_small, run_once(spark, name, SF1))
        t_big = run_once(spark, name, SF10)
        if t_small > 0 and t_big / t_small > thresh:
            # one-time sf10 fixture builds masquerade as blowups:
            # warm re-run before a flag counts (soak_sf1 discipline)
            t_big = min(t_big, run_once(spark, name, SF10))
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[name] = {
            "sf1_sec": round(t_small, 3),
            "sf10_sec": round(t_big, 3),
            "ratio": round(ratio, 2),
        }
        flag = " SUPERLINEAR" if ratio > thresh else ""
        print(json.dumps({"query": name, **results[name]}) + flag, flush=True)
        if ratio > thresh:
            bad.append(name)
    print(
        json.dumps(
            {
                "soak": "sf10",
                "n": len(names),
                "flagged": bad,
                "max_ratio": max(r["ratio"] for r in results.values()),
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
