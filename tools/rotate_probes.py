"""Compute the next round's DRIVER_PROBES batch.

The driver's correctness gate samples the first 50 queries()
alphabetically per round; `__spark_entry__.DRIVER_PROBES` re-registers
a rotating batch of not-yet-driver-verified queries under early-sorting
`a_chk_<name>` aliases so every query eventually gets a driver verdict.

This tool reads every CORRECTNESS_r*.json in the repo root, collects
the names that already have a full verdict (rows+schema+hash true, or
rows-only for oracle-less queries), strips probe prefixes, and prints
the next batch of unverified names (alphabetical, capped at 50) ready
to paste into DRIVER_PROBES. Re-run at the start of each round once
the new CORRECTNESS file lands.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402

PREFIX = "a_chk_"


def verified_names(repo_root: str) -> set[str]:
    done: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        for name, v in json.load(open(path)).items():
            base = name[len(PREFIX):] if name.startswith(PREFIX) else name
            if base not in REGISTRY:
                continue
            ok_full = v.get("rows_match") and v.get("schema_match") and v.get(
                "hash_match"
            )
            ok_rows_only = (
                v.get("err") == "no_oracle"
                and REGISTRY[base].oracle is None
                and (v.get("spark_rows") or 0) > 0
            )
            if ok_full or ok_rows_only:
                done.add(base)
    return done


def changed_names(repo_root: str) -> set[str]:
    """Queries whose defining module was edited after the newest
    CORRECTNESS file landed — i.e. changed THIS round. They carry the
    most risk, so they jump the rotation queue (ADVICE r02)."""
    corr = glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))
    if not corr:
        return set()
    cutoff = max(os.path.getmtime(p) for p in corr)
    out = set()
    for name, q in REGISTRY.items():
        src = getattr(q.spark, "__code__", None)
        if src and os.path.getmtime(src.co_filename) > cutoff:
            out.add(name)
    return out


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    done = verified_names(root)
    hot = changed_names(root)
    pending = sorted(
        (n for n in REGISTRY if n not in done),
        key=lambda n: (n not in hot, n),
    )
    batch = sorted(pending[:50])
    print(
        f"# verified: {len(done)}  pending: {len(pending)}"
        f"  changed-this-round prioritized: {len(hot & set(pending))}"
    )
    print("DRIVER_PROBES = [")
    for n in batch:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
