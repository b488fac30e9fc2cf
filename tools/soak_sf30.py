#!/usr/bin/env python
"""sf10 -> sf30 spot soak (VERDICT r12 "Next round" #7): confirm the
three rows that scaled ≈ the data ratio at sf10 stay LINEAR one more
3x step. Protocol mirrors soak_sf10.py: two sf10 runs (min = warm),
one sf30 run, re-run once before a flag counts. Threshold 4.5x for a
3x data step (linear plan + fixed overhead < 3x + headroom; beyond
that the work grew superlinearly).

Prereq: python tools/make_sf10.py && python tools/make_sf30.py
Usage:  SPARK_GRAFT_DRIVER_MEM=48g python tools/soak_sf30.py [names...]
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
SF10 = os.path.join(_ROOT, ".data_cache", "sf10")
SF30 = os.path.join(_ROOT, ".data_cache", "sf30")

# the three declared ≈data-ratio rows from the r12 decade table
DEFAULT = ["stream_dedup_ttl", "llm_knn_brute", "llm_hard_negatives"]

THRESHOLD = 4.5


def run_once(spark, name: str, sf_dir: str) -> float:
    spark.catalog.clearCache()
    t0 = time.time()
    REGISTRY[name].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT

    spark = get_spark("soak_sf30")
    flagged = []
    ratios = []
    for name in names:
        t10 = min(run_once(spark, name, SF10), run_once(spark, name, SF10))
        t30 = run_once(spark, name, SF30)
        ratio = t30 / t10 if t10 > 0 else float("inf")
        if ratio > THRESHOLD:  # re-run once: sf30 fixture builds are one-time
            t30 = run_once(spark, name, SF30)
            ratio = t30 / t10 if t10 > 0 else float("inf")
        rec = {
            "query": name,
            "sf10_sec": round(t10, 3),
            "sf30_sec": round(t30, 3),
            "ratio": round(ratio, 2),
        }
        print(json.dumps(rec), flush=True)
        ratios.append(ratio)
        if ratio > THRESHOLD:
            flagged.append(name)
    print(
        json.dumps(
            {
                "soak": "sf30",
                "n": len(names),
                "flagged": flagged,
                "max_ratio": round(max(ratios), 2) if ratios else None,
            }
        )
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
