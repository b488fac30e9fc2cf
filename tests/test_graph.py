"""Functional tests for the co-occurrence graph operators
(plans/graph.py): planted-triangle recall and the per-block cap.
"""

from __future__ import annotations

import datetime
import os

import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.plans.graph import BLOCK_CAP

from tests.conftest import SF_SMOKE

H0 = datetime.datetime(2024, 1, 1, 10, 0, 0)


def _sf_with_events(spark, tmp_path, rows):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    os.unlink(f"{sf}/events.parquet")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).toPandas().to_parquet(f"{sf}/events.parquet", index=False)
    return sf


def test_planted_triangle(spark, tmp_path):
    # users 1,2,3 share a cell (triangle); user 4 co-occurs with 1
    # only, in a different cell -> degree 1, excluded from output.
    rows = [
        (1, H0, 1, "view", 1.0, "{}"),
        (2, H0, 2, "view", 1.0, "{}"),
        (3, H0, 3, "view", 1.0, "{}"),
        (4, H0 + datetime.timedelta(hours=2), 1, "click", 1.0, "{}"),
        (5, H0 + datetime.timedelta(hours=2), 4, "click", 1.0, "{}"),
    ]
    sf = _sf_with_events(spark, tmp_path, rows)
    out = {
        r["user_id"]: r.asDict()
        for r in REGISTRY["graph_triangles"].spark(spark, sf).collect()
    }
    assert set(out) == {1, 2, 3}  # user 4 has degree 1
    assert out[1] == {
        "user_id": 1,
        "degree": 3,
        "n_triangles": 1,
        "clustering": pytest.approx(1 / 3, abs=1e-6),
    }
    for u in (2, 3):
        assert out[u]["degree"] == 2
        assert out[u]["n_triangles"] == 1
        assert out[u]["clustering"] == 1.0


def test_block_cap_bounds_pairs(spark, tmp_path):
    # One Zipf-head cell with BLOCK_CAP + 8 users: the edge set must
    # be C(BLOCK_CAP, 2) over the first BLOCK_CAP user_ids, never
    # |block| choose 2.
    n = BLOCK_CAP + 8
    rows = [
        (i, H0, 100 + i, "view", 1.0, "{}") for i in range(n)
    ]
    sf = _sf_with_events(spark, tmp_path, rows)
    deg = REGISTRY["graph_degree"].spark(spark, sf).collect()
    n_edges = sum(r["degree"] for r in deg) // 2
    assert n_edges == BLOCK_CAP * (BLOCK_CAP - 1) // 2
    # the capped membership is deterministic: lowest user_ids win
    assert {r["user_id"] for r in deg} == {100 + i for i in range(BLOCK_CAP)}


def test_m4_emits_four_roles_per_bucket(spark):
    # every (event_type, day) bucket emits exactly one row per role,
    # and the min/max roles bound the first/last values
    from pyspark.sql import functions as F
    from event_stream_for_k8s_spark.plans import REGISTRY

    df = REGISTRY["ts_downsample_m4"].spark(spark, SF_SMOKE)
    per = (
        df.groupBy("event_type", "d")
        .pivot("role", ["first", "last", "min", "max"])
        .agg(F.first("value"))
    ).collect()
    assert per, "no buckets"
    for r in per:
        for role in ("first", "last", "min", "max"):
            assert r[role] is not None, r
        assert r["min"] <= min(r["first"], r["last"]) and r["max"] >= max(
            r["first"], r["last"]
        ), r


def test_mad_fence_survives_outlier(spark, tmp_path):
    # one 1e9 outlier among 11 well-behaved points: the MAD fence
    # flags exactly the outlier; a z-score fence would flag nothing
    # (the outlier inflates the stddev past its own deviation)
    import datetime
    from event_stream_for_k8s_spark.plans import REGISTRY

    rows = [
        (i, H0 + datetime.timedelta(minutes=i), 1, "view",
         10.0 + (i % 3), "{}")
        for i in range(11)
    ] + [(99, H0, 2, "view", 1e9, "{}")]
    sf = _sf_with_events(spark, tmp_path, rows)
    out = REGISTRY["ts_mad_anomaly"].spark(spark, sf).collect()
    (r,) = out
    assert r["n"] == 12
    assert 10.0 <= r["med"] <= 12.0
    assert r["n_anom"] == 1


def test_acf_detects_planted_period(spark, tmp_path):
    # alternating busy/quiet hours (period 2): lag-2 autocorrelation
    # is strongly positive, lag-1 strongly negative
    import datetime
    from event_stream_for_k8s_spark.plans import REGISTRY

    rows = []
    eid = 0
    for hr in range(48):
        n = 5 if hr % 2 == 0 else 1
        for j in range(n):
            rows.append(
                (eid, H0 + datetime.timedelta(hours=hr, minutes=j), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    sf = _sf_with_events(spark, tmp_path, rows)
    out = {r["lag"]: r["acf"] for r in
           REGISTRY["ts_acf"].spark(spark, sf).collect()}
    assert out[2] > 0.9
    assert out[1] < -0.9


def test_cusum_alarms_after_level_shift(spark, tmp_path):
    # 36 quiet hours (1 event) then 12 busy hours (9 events): the
    # CUSUM statistic must alarm inside the shifted region and stay
    # silent through the quiet prefix; the closed-form (prefix sum
    # minus running floor) must equal the textbook recursion.
    import datetime
    from event_stream_for_k8s_spark.plans import REGISTRY

    rows, eid = [], 0
    for hr in range(48):
        n = 9 if hr >= 36 else 1
        for j in range(n):
            rows.append(
                (eid, H0 + datetime.timedelta(hours=hr, minutes=j), 1,
                 "view", 1.0, "{}")
            )
            eid += 1
    sf = _sf_with_events(spark, tmp_path, rows)
    out = sorted(
        REGISTRY["ts_cusum"].spark(spark, sf).collect(),
        key=lambda r: r["h"],
    )
    assert len(out) == 48
    alarms = [i for i, r in enumerate(out) if r["is_alarm"]]
    assert alarms and min(alarms) >= 36, alarms
    assert out[47]["is_alarm"]
    # closed form == recursion (python reference, same integers)
    n = 48
    xs = [r["x"] for r in out]
    sx = sum(xs)
    s_ref, ref = 0, []
    for x in xs:
        s_ref = max(0, s_ref + (n * x - sx))
        ref.append(s_ref)
    assert [r["cusum_scaled"] for r in out] == ref


def test_planted_jaccard(spark, tmp_path):
    # same planted shape as test_planted_triangle: K3 on {1,2,3} plus
    # a pendant edge (1,4) in another cell
    rows = [
        (1, H0, 1, "view", 1.0, "{}"),
        (2, H0, 2, "view", 1.0, "{}"),
        (3, H0, 3, "view", 1.0, "{}"),
        (4, H0 + datetime.timedelta(hours=2), 1, "click", 1.0, "{}"),
        (5, H0 + datetime.timedelta(hours=2), 4, "click", 1.0, "{}"),
    ]
    sf = _sf_with_events(spark, tmp_path, rows)
    out = {
        (r["s"], r["d"]): r.asDict()
        for r in REGISTRY["graph_jaccard"].spark(spark, sf).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 3), (1, 4)}
    # edge (2,3): common neighbor {1}; union N(2)+N(3)-common = 3
    assert out[(2, 3)]["common"] == 1
    assert out[(2, 3)]["jaccard"] == pytest.approx(1 / 3, abs=1e-6)
    # pendant edge (1,4): nothing in common
    assert out[(1, 4)]["common"] == 0
    assert out[(1, 4)]["jaccard"] == 0.0



def test_kcore_peel_matches_python_reference(spark):
    """kcore_peel == the textbook iterative peel on crafted graphs:
    a triangle with a pendant path (cascade: the tail unravels link
    by link), plus an isolated edge that must fully dissolve."""
    from pyspark.sql import functions as F

    from event_stream_for_k8s_spark.operators.graph import kcore_peel

    # triangle 1-2-3; path 3-4-5; isolated edge 6-7
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (6, 7)]

    def reference(edges, k):
        import collections

        adj = collections.defaultdict(set)
        for s, d in edges:
            adj[s].add(d)
            adj[d].add(s)
        alive = set(adj)
        while True:
            drop = {
                v
                for v in alive
                if sum(1 for u in adj[v] if u in alive) < k
            }
            if not drop:
                break
            alive -= drop
        return {
            v: sum(1 for u in adj[v] if u in alive) for v in alive
        }

    df = spark.createDataFrame(edges, "src long, dst long")
    und = df.union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    for k in (1, 2, 3):
        rows = kcore_peel(und, k=k, rounds=8).collect()
        got = {r["v"]: r["core_deg"] for r in rows}
        assert got == reference(edges, k), f"k={k}"
        assert all(r["converged"] for r in rows)


def test_kcore_bounded_rounds_reports_nonconvergence(spark):
    """A long path needs ~len/2 peel rounds for k=2; with rounds=2 the
    bounded peel must report converged=False rather than pretending
    the survivors are the core."""
    from pyspark.sql import functions as F

    from event_stream_for_k8s_spark.operators.graph import kcore_peel

    path = [(i, i + 1) for i in range(1, 12)]
    df = spark.createDataFrame(path, "src long, dst long")
    und = df.union(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    rows = kcore_peel(und, k=2, rounds=2).collect()
    assert rows  # interior nodes still standing after 2 rounds
    assert all(not r["converged"] for r in rows)
    done = kcore_peel(und, k=2, rounds=8).collect()
    assert done == []  # a bare path has no 2-core
