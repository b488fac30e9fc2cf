#!/usr/bin/env python
"""Measure the streaming state surface under BOTH state-store
providers (r16, VERDICT r15 #7): the registered streaming queries run
their keyed state on the default (HDFS-backed in-memory) provider
unless ``SPARK_GRAFT_STATESTORE_PROVIDER`` pins RocksDB — the 100 TB
posture is config, not code (tests/test_rocksdb_posture.py pins the
functional claim, oracle-checked). This tool puts a NUMBER on that
posture so the claim is driver-visible: each query runs to completion
(availableNow) under each provider, bench.py methodology (warm-up +
median of 3, one session, cache cleared between queries).

The bench row itself (stream_dedup_ttl on the default provider) is
unchanged — it measures the default surface; this artifact records
what switching the posture costs/saves at the same SF.

Usage: python tools/soak_streaming_state.py [--sf DIR] [--runs N]
                                            [names...]
Prints one JSON line per provider plus a combined line; write it to
SOAK_streaming_rocksdb.json for the round artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_stream_for_k8s_spark.caching import (  # noqa: E402
    release_query_caches,
)
from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402
from event_stream_for_k8s_spark.session import get_spark  # noqa: E402

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

# the stateful streaming surface: watermark dedup (the headline row),
# windowed aggregations, session windows, stream-stream join, custom
# transformWithState — the query classes whose cost is state-store
# commit machinery
DEFAULT_NAMES = [
    "stream_dedup_ttl",
    "stream_tumbling",
    "stream_sliding",
    "stream_session",
    "stream_stream_join",
    "stream_stateful_custom",
]


def run_once(spark, name: str, sf_dir: str) -> float:
    t0 = time.time()
    df = REGISTRY[name].spark(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def sweep(spark, names, sf_dir, runs) -> dict[str, float]:
    out: dict[str, float] = {}
    for name in names:
        run_once(spark, name, sf_dir)  # warm-up
        out[name] = round(
            statistics.median(
                run_once(spark, name, sf_dir) for _ in range(runs)
            ),
            3,
        )
        release_query_caches()
        spark.catalog.clearCache()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT_NAMES

    spark = get_spark("soak_streaming_state")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.path.basename(os.path.normpath(args.sf)).replace("sf", "")

    results = {}
    for tag, provider in [("default", None), ("rocksdb", ROCKSDB)]:
        # the provider env is read per streaming-session clone, so an
        # in-process flip pins every subsequent query's state store
        if provider is None:
            os.environ.pop("SPARK_GRAFT_STATESTORE_PROVIDER", None)
        else:
            os.environ["SPARK_GRAFT_STATESTORE_PROVIDER"] = provider
        timings = sweep(spark, names, args.sf, args.runs)
        results[tag] = timings
        print(
            json.dumps(
                {
                    "metric": f"streaming_state_total_sec_{tag}",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                    "provider": provider or "default(HDFSBackedStateStore)",
                }
            ),
            flush=True,
        )
    ratio = {
        n: round(results["rocksdb"][n] / results["default"][n], 2)
        for n in names
        if results["default"].get(n)
    }
    print(json.dumps({"metric": "rocksdb_over_default_ratio", "queries": ratio}))


if __name__ == "__main__":
    main()
