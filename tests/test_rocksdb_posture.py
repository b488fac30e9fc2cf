"""The RocksDB state-store posture, executed (VERDICT r11 #2).

SURVEY §4.2 / the stream_doc_dedup plan notes claim the 100 TB dedup
state runs on the RocksDB state store; until now every registered
streaming query only ever executed on the default HDFS-backed
provider. This module pins the claim:

- the REGISTERED queries `stream_doc_dedup` and `stream_dedup_ttl`
  run oracle-green with the provider pinned through the
  ``SPARK_GRAFT_STATESTORE_PROVIDER`` knob (`_streaming_session`
  forwards it to the clone every streaming query runs in — posture
  is config, not code);
- `maint_state_inspect` builds its checkpoint ON RocksDB and the
  ``statestore`` reader reads the RocksDB-resident state back,
  oracle-green;
- a mechanism probe proves the knob engages the provider for real:
  the checkpoint's state directory carries RocksDB artifacts
  (``*.zip`` snapshots / ``*.changelog``), not the default
  provider's ``*.delta`` files.

Fresh symlinked SF dirs throughout: a checkpoint written by one
provider cannot be opened by the other, so provider-pinned runs must
never share the default fixture caches.
"""

from __future__ import annotations

import glob
import os

import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.testing.oracle import (
    check_query,
    connect_oracle,
)

from tests.conftest import SF_SMOKE

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


@pytest.fixture()
def fresh_sf(tmp_path):
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    for t in TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    return sf


@pytest.mark.parametrize(
    "name",
    ["stream_doc_dedup", "stream_dedup_ttl", "stream_mm_dedup"],
)
def test_registered_stream_query_on_rocksdb(
    spark, fresh_sf, monkeypatch, name
):
    monkeypatch.setenv("SPARK_GRAFT_STATESTORE_PROVIDER", ROCKSDB)
    con = connect_oracle(fresh_sf)
    try:
        res = check_query(spark, con, REGISTRY[name], fresh_sf)
    finally:
        con.close()
    assert res.ok, str(res)


def test_state_inspect_reads_rocksdb_store(spark, fresh_sf):
    """maint_state_inspect runs on the parent session: pin the
    provider there, build the checkpoint on RocksDB, and read the
    state back through format("statestore") — then assert from the
    on-disk layout that RocksDB (not the default provider) owns the
    state files."""
    from event_stream_for_k8s_spark.sources.roundtrip import cache_dir

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
    con = connect_oracle(fresh_sf)
    try:
        res = check_query(
            spark, con, REGISTRY["maint_state_inspect"], fresh_sf
        )
    finally:
        con.close()
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert res.ok, str(res)

    state_root = os.path.join(
        cache_dir(fresh_sf, "state_inspect"), "ck", "state"
    )
    rocks = glob.glob(f"{state_root}/**/*.zip", recursive=True) + glob.glob(
        f"{state_root}/**/*.changelog", recursive=True
    )
    deltas = glob.glob(f"{state_root}/**/*.delta", recursive=True)
    assert rocks, f"no RocksDB snapshot/changelog under {state_root}"
    assert not deltas, f"default-provider delta files present: {deltas[:3]}"


def test_state_partitions_env_overrides_clone_layout(spark, monkeypatch):
    """SPARK_GRAFT_STATE_PARTITIONS re-sizes the state layout of every
    registered streaming query's session clone — the keyspace-sized
    knob SURVEY §4.2 prescribes (the sf10 soak measured the 8-partition
    test pin as the dominant cost of a 10M-key dedup). Parent session
    conf stays untouched."""
    from event_stream_for_k8s_spark.plans.streaming_queries import (
        _restore_parent,
        _streaming_session,
    )

    monkeypatch.setenv("SPARK_GRAFT_STATE_PARTITIONS", "64")
    ss = _streaming_session(spark)
    try:
        assert ss.conf.get("spark.sql.shuffle.partitions") == "64"
        assert spark.conf.get("spark.sql.shuffle.partitions") != "64"
    finally:
        _restore_parent(ss)
    monkeypatch.delenv("SPARK_GRAFT_STATE_PARTITIONS")
    ss2 = _streaming_session(spark)
    try:
        assert ss2.conf.get("spark.sql.shuffle.partitions") == "8"
    finally:
        _restore_parent(ss2)


def test_streaming_session_knob_engages_rocksdb(spark, monkeypatch, tmp_path):
    """Mechanism probe for the env knob itself: a dedup stream run
    through the SAME `_streaming_session` path the registry queries
    use, with an explicit checkpoint so the state layout is
    inspectable — RocksDB artifacts present, default-provider deltas
    absent, and the dedup answer unchanged."""
    import json as _json

    from event_stream_for_k8s_spark.plans.streaming_queries import (
        _restore_parent,
        _streaming_session,
    )
    from event_stream_for_k8s_spark.streaming.dedup_pipeline import (
        dedup_within_ttl,
    )

    monkeypatch.setenv("SPARK_GRAFT_STATESTORE_PROVIDER", ROCKSDB)
    ss = _streaming_session(spark)
    assert (
        ss.conf.get("spark.sql.streaming.stateStore.providerClass")
        == ROCKSDB
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    with open(os.path.join(src, "a.json"), "w") as f:
        for k, t in (
            ("a", "2024-01-01T00:00:00"),
            ("a", "2024-01-01T00:00:01"),
            ("b", "2024-01-01T00:00:02"),
        ):
            f.write(_json.dumps({"k": k, "time": t}) + "\n")
    ck = str(tmp_path / "ck")
    out: list[str] = []
    try:
        df = ss.readStream.schema("k string, time timestamp").json(src)
        q = (
            dedup_within_ttl(df, key_col="k", time_col="time")
            .writeStream.foreachBatch(
                lambda b, i: out.extend(r["k"] for r in b.collect())
            )
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        _restore_parent(ss)
    assert sorted(out) == ["a", "b"]
    rocks = glob.glob(f"{ck}/state/**/*.zip", recursive=True) + glob.glob(
        f"{ck}/state/**/*.changelog", recursive=True
    )
    assert rocks, f"no RocksDB artifacts under {ck}/state"
    assert not glob.glob(f"{ck}/state/**/*.delta", recursive=True)
