#!/usr/bin/env python
"""Run the driver-style oracle comparison locally.

Usage: python tools/selfcheck.py [query ...] [--sf DIR]
Default DIR: /root/testdata/sf0.001 (fast inner loop; driver gate runs
at sf0.01 — rerun there before declaring an operator done).
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402
from event_stream_for_k8s_spark.testing.oracle import (  # noqa: E402
    check_query,
    connect_oracle,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[])
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    names = args.names or sorted(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; have {sorted(REGISTRY)}")
        return 2

    spark = get_spark("selfcheck")
    con = connect_oracle(args.sf)
    failed = 0
    for n in names:
        try:
            r = check_query(spark, con, REGISTRY[n], args.sf)
        except Exception as e:  # noqa: BLE001
            failed += 1
            print(f"[ERR ] {n} :: {type(e).__name__}: {e}")
            continue
        if not r.ok:
            failed += 1
        print(r)
    print(f"\n{len(names) - failed}/{len(names)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
