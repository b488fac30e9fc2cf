#!/usr/bin/env python
"""Baseline v2 recorder (VERDICT r10 #4): one consolidated protocol
run — 1 warm-up + median of 3 timed runs per query, cache cleared
between queries, load checked before starting — over the
HEADLINE + RISK set at sf0.1. Prints one JSON line per query plus a
markdown table ready to paste into BASELINE.md.

Usage: python tools/baseline_v2.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, run_once  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402
from tools.soak_sf1 import RISK  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    load1 = os.getloadavg()[0]
    if load1 > 1.0:
        print(f"load {load1:.2f} > 1.0 — not a quiet box, refusing "
              "(the r03 protocol precedent)", file=sys.stderr)
        return 1
    names = args.names or list(dict.fromkeys(HEADLINE + RISK))
    spark = get_spark("baseline_v2")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in names:
        run_once(spark, name, args.sf)  # warm-up
        med = round(
            statistics.median(
                run_once(spark, name, args.sf) for _ in range(args.runs)
            ),
            3,
        )
        spark.catalog.clearCache()
        rows.append((name, med))
        print(json.dumps({"query": name, "sec": med}), flush=True)
    total = round(sum(s for _, s in rows), 3)
    print(json.dumps({"baseline_v2_total": total, "n": len(rows),
                      "load_at_start": round(load1, 2)}))
    print("\n| query | sf | sec/query (median of 3) |")
    print("|---|---|---|")
    for name, med in rows:
        print(f"| {name} | 0.1 | {med} |")
    print(f"| **total ({len(rows)} queries)** | 0.1 | **{total}** |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
