"""Totality sweep over the EVENTS-reading families: every query whose
oracle touches the events table must survive — and oracle-match on —
a degenerate events table (same-ts tie storms, a far-future outlier,
empty event_type/props, +-1e9 values, an identical redelivered
duplicate row, a single-user long gap).

Round 3's first run caught: ANSI cast crashes on non-numeric/empty
props (agg_multidim, fn_json, fn_variant), int64 moment overflow at
|value| ~ 3e8 (ts_anomaly -> scale-0 decimal/hugeint), a backward x
forward cross-pairing blowup on duplicate left keys
(join_asof_nearest), hive's ''->NULL partition-value roundtrip
(maint_partition_overwrite), and streaming oracles that modeled the
doubled delivery but not an in-table duplicate (stream_dedup_ttl /
foreach_metrics / watermark).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.testing.oracle import (
    check_query,
    connect_oracle,
)

from tests.conftest import SF_SMOKE

T0 = dt.datetime(2024, 1, 15, 12, 0, 0)
ROWS = (
    [(i + 1, T0, 7, "click", 1.0, "{}") for i in range(5)]  # tie storm
    + [
        (100, T0 + dt.timedelta(days=400), 8, "view", 0.0, "{}"),
        (101, T0 + dt.timedelta(hours=1), 9, "", -1e9, ""),
        (102, T0 + dt.timedelta(hours=2), 9, "purchase", 1e9,
         '{"k":"v"}'),
        (102, T0 + dt.timedelta(hours=2), 9, "purchase", 1e9,
         '{"k":"v"}'),  # identical redelivery
        (103, T0 + dt.timedelta(days=30), 9, "error", 0.5, "{}"),
    ]
)

EVENT_FAMILIES = (
    "stream_", "ts_", "batch_", "source_", "sink_", "scan_json",
    "scan_xml", "maint_",
)

NAMES = sorted(
    n for n, q in REGISTRY.items()
    if "events" in (q.oracle or "") or n.startswith(EVENT_FAMILIES)
)


@pytest.fixture(scope="module")
def degen_ev_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degenev") / "sf")
    os.makedirs(sf)
    for t in TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    os.unlink(f"{sf}/events.parquet")
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "ts": pa.array([r[1] for r in ROWS], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
        "event_type": pa.array([r[3] for r in ROWS], pa.string()),
        "value": pa.array([r[4] for r in ROWS], pa.float64()),
        "props": pa.array([r[5] for r in ROWS], pa.string()),
    })
    pq.write_table(tbl, f"{sf}/events.parquet")
    return sf


@pytest.fixture(scope="module")
def degen_ev_con(degen_ev_sf):
    con = connect_oracle(degen_ev_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_degenerate_events(spark, degen_ev_con, degen_ev_sf, name):
    res = check_query(spark, degen_ev_con, REGISTRY[name], degen_ev_sf)
    assert res.ok, str(res)
