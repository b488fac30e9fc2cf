#!/usr/bin/env python
"""Print the physical plan of any registered query.

    python tools/explain.py topk_per_group [llm_knn_brute ...]
    python tools/explain.py --sf /root/testdata/sf0.01 join_broadcast

Useful for eyeballing the scale properties SCALING.md claims and
tests/test_plans.py asserts: PushedFilters / ReadSchema (pushdown &
pruning), BroadcastHashJoin vs SortMergeJoin, Exchange count
(shuffles), WholeStageCodegen spans.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="registered query names")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        if name not in REGISTRY:
            print(f"unknown query {name!r}", file=sys.stderr)
            continue
        print(f"\n=== {name} ===")
        REGISTRY[name].spark(spark, args.sf).explain("formatted")


if __name__ == "__main__":
    main()
