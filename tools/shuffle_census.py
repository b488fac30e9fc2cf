#!/usr/bin/env python
"""Registry-wide shuffle census: count Exchange nodes in every
registered query's physical plan (the brief's discipline — explain
every operator — made systematic and repeatable).

For each query: build the DataFrame at the given SF and count
  - `shuffles`: `Exchange hashpartitioning/rangepartitioning/...`
    nodes (real data movement; SinglePartition exchanges counted
    separately — they are the global-sort / scalar-agg tells),
  - `broadcasts`: `BroadcastExchange` nodes (bounded-side movement,
    the cheap kind),
and print one JSON line per query plus a summary with the heaviest
plans. A plan with many shuffles is not automatically wrong (TPC-H
multi-joins earn theirs) — the census exists so a NEW unjustified
exchange shows up as a diff against the recorded distribution.

Usage: python tools/shuffle_census.py [--sf DIR] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402


def _drop_initial_plans(plan: str) -> str:
    """Drop '== Initial Plan ==' sections from (possibly nested) AQE
    dumps. A materialized AdaptiveSparkPlan — e.g. inside a persisted
    relation's InMemoryRelation — prints BOTH its Final and Initial
    plans, so every exchange in it would count twice; the Initial
    section is the same plan pre-AQE, not extra data movement. A
    section spans the marker line and every following line indented
    deeper than the marker."""
    out = []
    skip_indent: int | None = None
    for ln in plan.splitlines():
        indent = len(ln) - len(ln.lstrip())
        if skip_indent is not None:
            if ln.strip() and indent > skip_indent:
                continue
            skip_indent = None
        if "== Initial Plan ==" in ln:
            skip_indent = indent
            continue
        out.append(ln)
    return "\n".join(out)


def census(plan: str) -> dict[str, int]:
    # A ReusedExchange line EMBEDS the referenced exchange's own text
    # ("ReusedExchange [...], Exchange hashpartitioning(...)"), so
    # count on the plan with those lines dropped entirely — the
    # referenced node is counted once where it is defined. Initial-
    # plan sections of materialized AQE subtrees are dropped first
    # (each exchange counted once, in its Final Plan form).
    kept = "\n".join(
        ln
        for ln in _drop_initial_plans(plan).splitlines()
        if "ReusedExchange" not in ln
    )
    total = len(re.findall(r"(?<!Broadcast)Exchange ", kept))
    single = len(re.findall(r"Exchange SinglePartition", kept))
    return {
        # keyed data movement only; SinglePartition (global-sort /
        # scalar-agg reductions) reported separately, not double-
        # counted here
        "shuffles": total - single,
        "single_partition": single,
        "broadcasts": kept.count("BroadcastExchange"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or sorted(REGISTRY)

    spark = get_spark("shuffle_census")
    rows = {}
    errors = {}
    for name in names:
        try:
            df = REGISTRY[name].spark(spark, args.sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - census must finish
            errors[name] = f"{type(e).__name__}: {e}"[:120]
            continue
        rows[name] = census(plan)
        print(json.dumps({"query": name, **rows[name]}), flush=True)

    counts = sorted(r["shuffles"] for r in rows.values())
    n = len(counts)
    top = sorted(rows.items(), key=lambda kv: -kv[1]["shuffles"])[: args.top]
    print(
        json.dumps(
            {
                "census": "shuffles",
                "n": n,
                "errors": errors,
                "median": counts[n // 2] if n else 0,
                "p90": counts[int(n * 0.9)] if n else 0,
                "max": counts[-1] if n else 0,
                "top": [
                    {"query": k, **v} for k, v in top
                ],
            }
        )
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
