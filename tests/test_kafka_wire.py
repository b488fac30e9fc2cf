"""The from-scratch Kafka wire-protocol transport (VERDICT r12
missing #3): codec round trips, CRC enforcement, truncated-tail
pagination, and the Spark DataSource's per-partition parallelism —
all over real TCP against the stub broker."""

from __future__ import annotations

import pytest

from event_stream_for_k8s_spark.sources.kafka_wire import (
    KafkaWireClient,
    StubKafkaBroker,
    decode_message_set,
    encode_message_set,
)


@pytest.fixture()
def broker():
    logs = {
        ("docs", 0): [(b"0", b"hello"), (b"4", b"world"), (None, b"nullkey")],
        ("docs", 1): [
            (str(i).encode(), f"v{i}".encode()) for i in range(200)
        ],
    }
    b = StubKafkaBroker(logs).start()
    yield b
    b.stop()


def test_message_set_roundtrip_and_crc():
    entries = [(b"k1", b"v1"), (None, b"no-key"), (b"k3", b"x" * 100)]
    ms = encode_message_set(entries, base_offset=7)
    got = decode_message_set(ms)
    assert got == [(7, b"k1", b"v1"), (8, None, b"no-key"), (9, b"k3", b"x" * 100)]

    # flip one payload byte: the CRC check must catch it
    bad = ms[:20] + bytes([ms[20] ^ 1]) + ms[21:]
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_message_set(bad)

    # a truncated trailing entry is the documented max_bytes cut,
    # not an error — parsing stops before it
    assert decode_message_set(ms[: len(ms) - 5]) == got[:2]


def test_metadata_and_fetch_over_tcp(broker):
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        brokers, parts = c.metadata("docs")
        assert brokers == [(0, "127.0.0.1", broker.port)]
        assert parts == [0, 1]
        hw, msgs = c.fetch("docs", 0, 0)
        assert hw == 3
        assert msgs == [
            (0, b"0", b"hello"),
            (1, b"4", b"world"),
            (2, None, b"nullkey"),
        ]
        # resume from a committed offset mid-partition
        _, tail = c.fetch("docs", 0, 2)
        assert tail == [(2, None, b"nullkey")]
        # unknown topic: no partitions in metadata, error code on fetch
        _, none = c.metadata("nope")
        assert none == []
        with pytest.raises(ValueError, match="error code 3"):
            c.fetch("nope", 0, 0)
    finally:
        c.close()


def test_fetch_all_paginates_through_truncated_tails(broker):
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        # 200 messages of ~25 bytes each through 256-byte fetches:
        # every response ends in a truncated entry the client must
        # re-request — the real consumer loop
        msgs = c.fetch_all("docs", 1, max_bytes=256)
        assert [o for o, _, _ in msgs] == list(range(200))
        assert msgs[137][2] == b"v137"
    finally:
        c.close()


def test_datasource_one_task_per_partition(spark, broker):
    from event_stream_for_k8s_spark.sources.kafka_wire import register

    register(spark)
    df = (
        spark.read.format("kafka-wire")
        .option("host", "127.0.0.1")
        .option("port", str(broker.port))
        .option("topic", "docs")
        .option("maxbytes", "256")
        .load()
    )
    assert df.rdd.getNumPartitions() == 2  # one Spark task per Kafka part
    rows = df.collect()
    assert len(rows) == 203
    p1 = sorted(
        (r["kafka_offset"], r["value"])
        for r in rows
        if r["partition"] == 1
    )
    assert p1[0] == (0, "v0") and p1[-1] == (199, "v199")
    nullkey = [r for r in rows if r["key"] is None]
    assert len(nullkey) == 1 and nullkey[0]["value"] == "nullkey"


def test_fetch_all_widens_past_oversized_message(broker):
    """A message larger than max_bytes yields an empty fetch below the
    high watermark; the drain must widen and retry, never silently
    return a partial log (ADVICE r13 silent-data-loss path)."""
    c = KafkaWireClient("127.0.0.1", broker.port)
    try:
        # partition 0's first message frame is ~40 bytes; max_bytes=8
        # truncates even the MessageSet header, so fetch #1 is empty
        msgs = c.fetch_all("docs", 0, max_bytes=8)
        assert [v for _, _, v in msgs] == [b"hello", b"world", b"nullkey"]
    finally:
        c.close()
