#!/usr/bin/env python
"""Scaling soak: time a query set at sf0.1 and sf1 (10x) and flag
superlinear plans (VERDICT r03 "Next round" #6).

A plan that is linear-ish in input size should scale by <= ~10x plus
fixed overhead when the data scales 10x; at test scale fixed overhead
(job setup, state-store commits) usually keeps the ratio well under
10. A ratio far above 10 is the llm_winnow-class failure mode — a
block/window/pair construction that grows superlinearly — and fails
the soak.

Query set: the 16 BASELINE.md headline queries plus the operators
whose shapes carry quadratic risk (self-joins over blocks, n-gram
pair construction, windowed dup profiles, triangle counting,
range-binned joins). Runs each query once through the noop sink
(bench.py protocol, no timed-median — the soak hunts 10x blowups,
not 5% drifts).

Usage: python tools/soak_sf1.py [--threshold 14] [names...]
Writes one JSON line per query and a final summary line; exit 1 if
any ratio exceeds the threshold.
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

HEADLINE = [
    "flagship_dedup_count",
    "k8s_envelope_multidim_count",
    "stream_dedup_ttl",
    "agg_hash",
    "agg_multidim",
    "join_inner_hash",
    "join_broadcast",
    "join_asof",
    "win_rank",
    "topk_per_group",
    "llm_dedup_exact",
    "llm_dedup_near",
    "llm_knn_brute",
    "llm_text_tfidf",
    "llm_fingerprint",
    "llm_quality",
]

# shapes with quadratic risk: block self-joins, pair construction,
# per-token windows, triangles, binned range joins, closure loops
RISK = [
    "llm_dedup_ngram",
    "llm_dedup_simhash",
    "llm_dedup_substring",
    "llm_winnow",
    "llm_minhash_sig",
    "llm_dedup_clusters",
    "llm_dedup_clusters_lsh",
    "llm_bpe_train",
    "llm_bpe_encode",
    "llm_bpe_encode_docs",
    "llm_bpe_pack",
    "llm_pack_pairs",
    "llm_bm25",
    "llm_inverted_index",
    "join_range_binned",
    "join_interval",
    "join_fuzzy_blocked",
    "graph_triangles",
    "graph_jaccard",
    "win_running_distinct",
    "ts_funnel",
    "tpch_q21_waiting_suppliers",
    # r11 additions: BPE-train iterations + corpus-wide window profile
    "llm_sft_pipeline",
    "llm_dedup_excise",
    "llm_sft_loss_mask",
]

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".data_cache",
    "sf1",
)


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
    names = args.names or (HEADLINE + RISK)

    spark = get_spark("soak_sf1")
    bad = []
    results = {}
    for name in names:
        # warm the fixture caches / JIT at the small SF first
        t_small = run_once(spark, name, SF01)
        t_small = min(t_small, run_once(spark, name, SF01))
        t_big = run_once(spark, name, SF1)
        ratio = t_big / t_small if t_small > 0 else float("inf")
        results[name] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "ratio": round(ratio, 2),
        }
        flag = " SUPERLINEAR" if ratio > args.threshold else ""
        print(
            json.dumps({"query": name, **results[name]})
            + flag,
            flush=True,
        )
        if ratio > args.threshold:
            bad.append(name)
    print(
        json.dumps(
            {
                "soak": "sf1",
                "n": len(names),
                "flagged": bad,
                "max_ratio": max(r["ratio"] for r in results.values()),
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
