"""Property-based invariants (SURVEY.md §5.2 item 4), hypothesis-driven.

Each property builds ONE DataFrame per generated example (examples are
capped low — a Spark job per example is the cost model) and asserts an
algebraic invariant that must hold for ANY input, not just the
fixtures: dedup idempotence, session partitioning, Morton-code
bijectivity vs a pure-Python reference, and the scaled-int sum
discipline agreeing with exact decimal arithmetic.
"""

from __future__ import annotations

import os

from decimal import Decimal

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# One Spark job per example is the cost model, so CI stays at 10;
# SPARK_GRAFT_HYPOTHESIS_EXAMPLES=200 turns the same suite into a
# deep soak (used for pre-close hardening runs).
SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_HYPOTHESIS_EXAMPLES", "10")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(0, 20),  # key
        st.integers(0, 10**6),  # ts-ish ordering value
        st.integers(-5, 5),  # payload
    ),
    min_size=1,
    max_size=60,
)


@given(data=rows)
@SETTINGS
def test_dedup_idempotent_and_unique(spark, data):
    from event_stream_for_k8s_spark.operators.dedup import dedup_rank

    df = spark.createDataFrame(data, "k int, ts long, v int")
    once = dedup_rank(df, ["k"], ["ts", "v"])
    twice = dedup_rank(once, ["k"], ["ts", "v"])
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    # idempotent
    assert got_once == got_twice
    # exactly one survivor per key, and it is the ORDER-minimal row
    expect = {}
    for k, ts, v in data:
        cur = expect.get(k)
        if cur is None or (ts, v) < cur:
            expect[k] = (ts, v)
    assert got_once == sorted((k, ts, v) for k, (ts, v) in expect.items())


@given(data=rows)
@SETTINGS
def test_dedup_first_agg_equals_dedup_rank(spark, data):
    """The min_by-aggregation dedup (map-side-combinable, no sort)
    is row-for-row the window dedup whenever the order is total per
    key — here (ts, v) over distinct rows; duplicate (k, ts, v) rows
    carry identical payloads so ties are harmless either way."""
    from event_stream_for_k8s_spark.operators.dedup import (
        dedup_first_agg,
        dedup_rank,
    )

    df = spark.createDataFrame(data, "k int, ts long, v int")
    ranked = sorted(
        map(tuple, dedup_rank(df, ["k"], ["ts", "v"]).collect())
    )
    agged = sorted(
        tuple(r)
        for r in dedup_first_agg(df, ["k"], ["ts", "v"])
        .select("k", "ts", "v")  # same column order as the input
        .collect()
    )
    assert ranked == agged


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=100,
    )
)
@SETTINGS
def test_morton_interleave_matches_reference(spark, pairs):
    from event_stream_for_k8s_spark.plans.maintenance import (
        _interleave_bits,
    )

    def ref(x: int, y: int) -> int:
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "x long, y long")
    got = df.select(
        "x", "y", _interleave_bits(F.col("x"), F.col("y"), 10).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == ref(r["x"], r["y"])
        # bijective: decode back by taking alternate bits
        xs = sum(((r["z"] >> (2 * i)) & 1) << i for i in range(10))
        ys = sum(((r["z"] >> (2 * i + 1)) & 1) << i for i in range(10))
        assert (xs, ys) == (r["x"], r["y"])


@given(
    vals=st.lists(
        # fixed-2dp decimals in a money-like range
        st.integers(-10**7, 10**7).map(lambda c: Decimal(c) / 100),
        min_size=1,
        max_size=80,
    )
)
@SETTINGS
def test_scaled_int_sum_is_exact(spark, vals):
    from event_stream_for_k8s_spark.plans.util import dsum

    df = spark.createDataFrame(
        [(float(v),) for v in vals], "x double"
    ).repartition(8)  # force a multi-partition merge order
    got = df.agg(dsum("x", 2).alias("s")).collect()[0]["s"]
    assert Decimal(str(got)) == sum(vals)


@given(
    events=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10**4)),
        min_size=1,
        max_size=60,
    ),
    gap=st.integers(1, 500),
)
@SETTINGS
def test_sessionize_partitions_rows(spark, events, gap):
    """Gap-sessionization invariants for any event set: sessions
    partition the rows, each session's internal gaps are <= gap, and
    consecutive sessions of a user are separated by > gap."""
    from pyspark.sql.window import Window

    data = [(u, ts, i) for i, (u, ts) in enumerate(events)]
    df = spark.createDataFrame(data, "u int, ts long, id int")
    w = Window.partitionBy("u").orderBy("ts", "id")
    flagged = df.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > gap),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w))
    got = flagged.collect()
    assert len(got) == len(data)  # partition: no loss, no dup
    by_user: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["u"], r["ts"], r["id"])):
        by_user.setdefault(r["u"], []).append(r)
    for rs in by_user.values():
        for a, b in zip(rs, rs[1:]):
            if b["sid"] == a["sid"]:
                assert b["ts"] - a["ts"] <= gap
            else:
                assert b["sid"] == a["sid"] + 1
                assert b["ts"] - a["ts"] > gap


def test_approx_percentile_error_envelope(spark):
    """The sketch percentiles stay within 1% rank error of exact."""
    import pyspark.sql.functions as F

    from event_stream_for_k8s_spark.plans import REGISTRY

    from event_stream_for_k8s_spark.plans.relational import (
        approx_percentile_sketch,
    )

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in approx_percentile_sketch(spark, sf).collect()
    }
    exact = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in REGISTRY["agg_percentile_multi"].spark(spark, sf).collect()
    }
    from event_stream_for_k8s_spark.catalog import load

    e = load(spark, sf, "events")
    for etype, apcts in approx.items():
        vals = sorted(
            x["value"] for x in e.filter(F.col("event_type") == etype)
            .select("value").collect()
        )
        n = len(vals)
        for q, a in zip((0.5, 0.9, 0.99), apcts):
            import bisect

            rank = bisect.bisect_left(vals, a) / n
            assert abs(rank - q) <= 0.01, (etype, q, a, rank)
        # and the exact twin is close in value terms too
        for a, x in zip(apcts, exact[etype]):
            assert abs(a - x) <= max(0.02 * abs(x), 0.5)


@given(
    hashes=st.lists(st.integers(0, 2**31 - 2), min_size=1, max_size=40)
)
@SETTINGS
def test_winnow_matches_reference_and_covers_every_window(spark, hashes):
    from event_stream_for_k8s_spark.functions.text import winnow_select

    w = 4
    df = spark.createDataFrame([(hashes,)], "h array<bigint>")
    got = sorted(
        (r.fp_pos, r.fp_hash)
        for r in df.select(
            F.explode(winnow_select(F.col("h"), w=w)).alias("s")
        ).select("s.fp_pos", "s.fp_hash").collect()
    )
    # pure-Python reference: rightmost minimum of every window of w
    expect = set()
    n = len(hashes)
    for j in range(max(n - w, 0) + 1):
        s = hashes[j : j + w]
        m = min(s)
        rightmost = j + max(i for i, v in enumerate(s) if v == m) + 1
        expect.add((rightmost, m))
    assert got == sorted(expect)
    # MOSS guarantee: every full window of w grams contains a selection
    if n >= w:
        pos = {p for p, _ in got}
        for j in range(n - w + 1):
            assert pos & set(range(j + 1, j + w + 1)), (j, sorted(pos))


@given(
    keys=st.lists(
        st.sampled_from(["a", "b", "c", "dd", "ee", "ff", "g1", "g2"]),
        min_size=1,
        max_size=60,
    )
)
@SETTINGS
def test_countmin_never_underestimates(spark, keys):
    """CM guarantee: est >= exact for every key, and est == exact when
    the key's 4 cells are collision-free (checked from the key set)."""
    import hashlib

    from event_stream_for_k8s_spark.plans.relational import (
        CM_DEPTH,
        CM_WIDTH,
        _cm_col_spark,
    )

    def col_of(key, row):
        h = hashlib.md5(f"{row}{key}".encode()).hexdigest()[:8]
        return int(h, 16) % CM_WIDTH

    df = spark.createDataFrame([(k,) for k in keys], "k string")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                _cm_col_spark(F.col("k"), i).alias("col"),
            )
            for i in range(CM_DEPTH)
        ]
    )
    sketch = {
        (r["cell"]["row"], r["cell"]["col"]): r["n"]
        for r in df.select(F.explode(cells).alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    from collections import Counter

    exact = Counter(keys)
    for k, n in exact.items():
        est = min(sketch[(i, col_of(k, i))] for i in range(CM_DEPTH))
        assert est >= n, (k, est, n)
        collides = any(
            any(
                col_of(k2, i) == col_of(k, i)
                for k2 in exact
                if k2 != k
            )
            for i in range(CM_DEPTH)
        )
        if not collides:
            assert est == n, (k, est, n)


@given(
    hashes=st.lists(
        st.one_of(st.integers(0, 2**31 - 2), st.none()),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_winnow_numpy_matches_expression_form(spark, hashes):
    """The mapInPandas fast path == the expression reference, including
    null gram hashes (short docs) which must never be selected."""
    from event_stream_for_k8s_spark.functions.text import (
        winnow_numpy,
        winnow_select,
    )

    w = 4
    df = spark.createDataFrame([(7, hashes)], "doc_id bigint, h array<bigint>")
    fast = sorted(
        (r.doc_id, r.fp_pos, r.fp_hash)
        for r in winnow_numpy(df, w=w).collect()
    )
    ref = sorted(
        (7, r.fp_pos, r.fp_hash)
        for r in df.select(
            F.explode(winnow_select(F.col("h"), w=w)).alias("s")
        )
        .select("s.fp_pos", "s.fp_hash")
        .filter(F.col("s.fp_hash").isNotNull())
        .collect()
    )
    assert fast == ref


@given(
    vals=st.lists(
        st.integers(-10**4, 10**4).map(lambda c: c / 100.0),
        min_size=1,
        max_size=30,
    )
)
@SETTINGS
def test_ewma_fir_matches_python_float_reference(spark, vals):
    from pyspark.sql import Window

    from event_stream_for_k8s_spark.plans.util import ewma_fir

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i int, x double"
    )
    w = Window.orderBy("i")
    got = {
        r.i: r.y
        for r in df.select("i", ewma_fir("x", w).alias("y")).collect()
    }
    for n in range(len(vals)):
        num, den = 0.0, 0.0
        # same left-assoc accumulation order as the Column expression:
        # k = 0 first, then increasing lags
        num = vals[n]
        den = 1.0
        for k in range(1, 8):
            if n - k >= 0:
                num = num + vals[n - k] * 0.5**k
                den = den + 0.5**k
        assert got[n] == num / den, (n, got[n], num / den)
    # bounded by the window extremes
    for n in range(len(vals)):
        lo = min(vals[max(0, n - 7) : n + 1])
        hi = max(vals[max(0, n - 7) : n + 1])
        assert lo - 1e-12 <= got[n] <= hi + 1e-12


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1,
             max_size=200)
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_equals_recursion(xs):
    """ts_cusum's closed form S_t = P_t - min(0, running-min of P)
    equals the textbook recursion S_t = max(0, S_{t-1} + d_t) for
    every integer series (d = n-scaled deviations, exactly as the
    plan computes them)."""
    n = len(xs)
    sx = sum(xs)
    ds = [n * x - sx for x in xs]
    # recursion
    s, rec = 0, []
    for d in ds:
        s = max(0, s + d)
        rec.append(s)
    # closed form
    p, mn, closed = 0, 0, []
    for d in ds:
        p += d
        mn = min(mn, p)
        closed.append(p - min(0, mn))
    assert closed == rec


range_events = st.lists(
    st.tuples(
        st.integers(1, 8),  # event_id — small domain FORCES dup ids
        st.integers(0, 7200),  # seconds offset within 2h — forces
                               # neighbors across the ±30min window
    ),
    min_size=1,
    max_size=25,
)


@given(data=range_events)
@SETTINGS
def test_range_count_prefix_sum_matches_brute(spark, data, tmp_path_factory):
    """join_range_binned's two-level prefix-sum (round-4 rewrite) must
    agree with the brute O(n^2) pair count for ANY id/timestamp
    multiset — including duplicate event_ids (the same-id exclusion
    the degenerate sweep caught) and boundary-exact ±30min ties."""
    import datetime as dt

    from event_stream_for_k8s_spark.plans import REGISTRY

    half = 1800
    base = dt.datetime(2024, 3, 1)
    rows = [
        (eid, base + dt.timedelta(seconds=s), 1, "click", 0.0, "{}")
        for eid, s in data
    ]
    sf = str(tmp_path_factory.mktemp("rng"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/events.parquet")

    got = {
        r["event_id"]: r["n_nearby"]
        for r in REGISTRY["join_range_binned"].spark(spark, sf).collect()
    }

    expect: dict[int, int] = {}
    for eid_a, sa in data:
        n = sum(
            1
            for eid_b, sb in data
            if eid_b != eid_a and sa - half <= sb <= sa + half
        )
        if n:
            expect[eid_a] = expect.get(eid_a, 0) + n
    assert got == expect


q21_rows = st.lists(
    st.tuples(
        st.integers(1, 6),   # orderkey — small domain forces sharing
        st.integers(1, 4),   # suppkey
        st.integers(1, 5),   # linenumber
    ),
    min_size=1,
    max_size=30,
    unique=True,
)


@given(data=q21_rows)
@settings(max_examples=60, deadline=None)
def test_q21_aggregate_rewrite_equals_literal_exists(data):
    """tpch_q21's EXISTS/NOT-EXISTS -> per-order distinct-supplier
    aggregate rewrite (n_supp >= 2 AND n_late = 1), proved equivalent
    to the LITERAL spec formulation on random order/supplier/line
    multisets — pure DuckDB, no Spark job, so hypothesis can afford
    real example counts. Lateness uses the same derived commit/receipt
    day-offset hashes as plans/tpch_partsupp.py."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE li (ok BIGINT, sk BIGINT, ln BIGINT)")
    con.executemany("INSERT INTO li VALUES (?, ?, ?)", data)
    base = """
WITH ext AS (
  SELECT ok, sk,
         (ok * 5 + ln * 11) % 30 + 1 > (ok * 7 + ln * 3) % 31 - 15
           AS late
  FROM li
), late AS (SELECT * FROM ext WHERE late)
"""
    literal = con.execute(
        base
        + """
SELECT l1.sk, count(*) AS numwait
FROM late l1
WHERE EXISTS (SELECT 1 FROM ext l2
              WHERE l2.ok = l1.ok AND l2.sk <> l1.sk)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.ok = l1.ok AND l3.sk <> l1.sk)
GROUP BY 1 ORDER BY 1
"""
    ).fetchall()
    rewrite = con.execute(
        base
        + """
, ords AS (
  SELECT ok, count(DISTINCT sk) AS n_supp,
         count(DISTINCT CASE WHEN late THEN sk END) AS n_late
  FROM ext GROUP BY ok
)
SELECT l1.sk, count(*) AS numwait
FROM late l1 JOIN ords USING (ok)
WHERE ords.n_supp >= 2 AND ords.n_late = 1
GROUP BY 1 ORDER BY 1
"""
    ).fetchall()
    assert literal == rewrite


def test_equi_depth_approx_binds_to_exact(spark):
    """The sketch-cutpoint histogram must agree with the exact ntile
    form up to sketch rank error: same total mass, same bucket count,
    near-equal depths, contiguous non-overlapping ranges."""
    from event_stream_for_k8s_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = {
        r["bucket"]: r
        for r in REGISTRY["agg_hist_equi_depth"].spark(spark, sf).collect()
    }
    from event_stream_for_k8s_spark.plans.relational import (
        equi_depth_approx_hist,
    )

    approx = sorted(
        equi_depth_approx_hist(spark, sf).collect(),
        key=lambda r: r["bucket"],
    )
    n_total = sum(r["n"] for r in exact.values())
    assert sum(r["n"] for r in approx) == n_total
    assert len(approx) == 16
    target = n_total / 16
    for r in approx:
        # accuracy=10000 -> rank error n/10000 < 1 row at this SF;
        # the slack covers ties at boundary values
        assert abs(r["n"] - target) <= max(10, 0.1 * target), r
    # ranges are ordered and non-overlapping
    for a, b in zip(approx, approx[1:]):
        assert a["hi"] <= b["lo"]


def test_ccnet_approx_binds_to_exact(spark):
    """Sketch-cutpoint terciles agree with the exact ntile terciles
    on all but a boundary band of documents, with identical scores."""
    from event_stream_for_k8s_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = {
        r["doc_id"]: r
        for r in REGISTRY["llm_ccnet_buckets"].spark(spark, sf).collect()
    }
    from event_stream_for_k8s_spark.plans.llm import ccnet_buckets_sketch

    approx = ccnet_buckets_sketch(spark, sf).collect()
    assert len(approx) == len(exact)
    agree = 0
    for r in approx:
        e = exact[r["doc_id"]]
        assert r["score"] == e["score"]  # scoring is shared + exact
        agree += r["bucket"] == e["bucket"]
    assert agree / len(approx) >= 0.95


docs_strategy = st.lists(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Ll", "Nd"), max_codepoint=0x7F
            ),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=12,
    ),
    min_size=1,
    max_size=6,
)


@given(docs_strategy)
@SETTINGS
def test_simhash32_expression_matches_python_reference(spark, docs):
    """The anchor's SQL construction IS the algorithm: md5-prefix bit
    votes, bit set iff vote positive — checked against a pure-Python
    implementation on arbitrary token lists."""
    import hashlib

    from event_stream_for_k8s_spark.plans.llm import simhash32

    def ref(tokens):
        votes = [0] * 32
        for t in set(tokens):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for i in range(32):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum(1 << i for i in range(32) if votes[i] > 0)

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["simhash32"] for r in simhash32(df).collect()}
    for i, toks in enumerate(docs):
        # split(" ") on the joined string reproduces the token list
        # (tokens are non-empty and space-free by construction)
        assert got[i] == ref(toks), (toks, got[i], ref(toks))


edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda p: p[0] != p[1]
    ),
    min_size=0,
    max_size=14,
    unique=True,
)


@given(edges_strategy)
@SETTINGS
def test_pagerank_exact_int_matches_python_reference(spark, edges):
    """The unrolled integer recurrence equals a sequential Python
    implementation on arbitrary small digraphs (nodes 0..7, any edge
    set, dangling nodes included)."""
    from event_stream_for_k8s_spark.plans.llm import _PR_T, pagerank_exact_int

    N = 8
    iters = 3

    def ref():
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {v: _PR_T // N for v in range(N)}
        for _ in range(iters):
            inflow = {v: 0 for v in range(N)}
            for s, d in edges:
                inflow[d] += r[s] // deg[s]
            dmass = sum(r[v] for v in range(N) if v not in deg)
            r = {
                v: (15 * _PR_T) // (100 * N)
                + (85 * (inflow[v] + dmass // N)) // 100
                for v in range(N)
            }
        return r

    nodes = spark.createDataFrame([(v,) for v in range(N)], "v long")
    und = spark.createDataFrame(
        edges or [(0, 1)], "src long, dst long"
    )
    if not edges:
        und = und.filter("src < 0")  # truly empty edge relation
    got = {
        r["v"]: r["rank_scaled"]
        for r in pagerank_exact_int(nodes, und, iters).collect()
    }
    assert got == ref()


asof_tables = st.tuples(
    # left: (key, time) — id assigned by enumeration
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    ),
    # right: (key, time, payload-or-NULL) — rid assigned by enumeration
    st.lists(
        st.tuples(
            st.integers(0, 5),
            st.integers(0, 50),
            st.one_of(st.none(), st.integers(-9, 9)),
        ),
        min_size=0,
        max_size=40,
    ),
)


@given(data=asof_tables)
@SETTINGS
def test_asof_join_matches_duckdb_spec(spark, data):
    """asof_join (union+window form) equals the executable spec "for
    each left row, the right row with max(time) <= left_time, ties to
    max(rid)" run in DuckDB — on random tables with duplicate keys,
    tied timestamps, NULL payload values, and (min_size=0) an empty
    right side. Payload fields must come from that ONE matched row
    even when its value is NULL (the per-column last(ignorenulls)
    formulation failed this: a NULL-payload right row could not
    overwrite an older deposit, and interleaved NULLs could stitch
    different rows' fields together)."""
    import duckdb

    from event_stream_for_k8s_spark.operators.joins import asof_join

    lrows, rrows = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
        "k int, t int, id long",
    )
    right = spark.createDataFrame(
        [(k, t, i, v) for i, (k, t, v) in enumerate(rrows)],
        "k int, t int, rid long, v long",
    )
    got = sorted(
        (r["id"], r["rid_asof"], r["v_asof"])
        for r in asof_join(
            left,
            right,
            on=["k"],
            left_time="t",
            right_time="t",
            payload=["rid", "v"],
            tiebreak="rid",
        ).collect()
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE l (k INT, t INT, id BIGINT)")
    con.execute("CREATE TABLE r (k INT, t INT, rid BIGINT, v BIGINT)")
    con.executemany(
        "INSERT INTO l VALUES (?, ?, ?)",
        [(k, t, i) for i, (k, t) in enumerate(lrows)],
    )
    if rrows:
        con.executemany(
            "INSERT INTO r VALUES (?, ?, ?, ?)",
            [(k, t, i, v) for i, (k, t, v) in enumerate(rrows)],
        )
    want = con.execute(
        """
SELECT l.id,
  (SELECT r.rid FROM r WHERE r.k = l.k AND r.t <= l.t
   ORDER BY r.t DESC, r.rid DESC LIMIT 1) AS rid_asof,
  (SELECT r.v FROM r WHERE r.k = l.k AND r.t <= l.t
   ORDER BY r.t DESC, r.rid DESC LIMIT 1) AS v_asof
FROM l ORDER BY l.id
"""
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_asof_join_null_payload_overwrites(spark):
    """Deterministic pin of the struct-deposit fix: the LATEST right
    row wins even when its payload value is NULL — it must shadow an
    older non-null deposit, not be skipped."""
    from event_stream_for_k8s_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10)], "k int, t int")
    right = spark.createDataFrame(
        [(1, 1, 100, 7), (1, 5, 101, None)],
        "k int, t int, rid long, v long",
    )
    [row] = asof_join(
        left,
        right,
        on=["k"],
        left_time="t",
        right_time="t",
        payload=["rid", "v"],
        tiebreak="rid",
    ).collect()
    assert (row["rid_asof"], row["v_asof"]) == (101, None)


cc_graphs = st.tuples(
    # edges: (src, dst) over a small id space — duplicates, self-loops,
    # reversed repeats, and multi-hop chains all arise naturally
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=40,
    ),
    # extra isolated node ids supplied via the `nodes` argument
    st.lists(st.integers(0, 19), min_size=1, max_size=10),
)


@given(data=cc_graphs)
@SETTINGS
def test_connected_components_matches_union_find(spark, data):
    """connected_components (iterative min-label + pointer jump)
    equals a pure-Python union-find on random graphs: every node gets
    the MIN node id of its component, isolated nodes (present only
    via `nodes`) label themselves, self-loops and duplicate/reversed
    edges are no-ops. Random graphs reach the pointer-jumping and
    convergence-sum paths that the planted fixture (test_llm) cannot:
    long chains, forks that merge late, components spanning the
    edge/node-arg boundary."""
    from event_stream_for_k8s_spark.operators.dedup import (
        connected_components,
    )

    edge_rows, extra_nodes = data
    edges = spark.createDataFrame(
        edge_rows or [(0, 0)], "src long, dst long"
    )
    if not edge_rows:
        edges = edges.filter(F.lit(False))
    nodes = spark.createDataFrame(
        [(n,) for n in extra_nodes], "node long"
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges, nodes=nodes).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    for s, d in edge_rows:
        union(s, d)
    for n in extra_nodes:
        find(n)
    comp_min: dict[int, int] = {}
    for n in parent:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {(n, comp_min[find(n)]) for n in parent}
    assert got == want


# ---------------------------------------------------------------------------
# Hypothesis differentials vs DuckDB executable specs (VERDICT r07 #4):
# the fixture-based oracle only sees the fixture's value distributions;
# these drive the hand-rolled operator families with adversarial inputs
# (NULL keys, duplicate keys/ids, tied and NULL ordering values, bucket
# boundaries) and compare against a plain-SQL spec — the technique that
# exposed the as-of NULL-payload bug in round 7.


range_rows = st.lists(
    st.tuples(
        st.integers(0, 6),  # id (duplicates likely)
        st.integers(-15, 45),  # t: negative + bucket-boundary values
    ),
    min_size=1,
    max_size=40,
)


@given(rows=range_rows, half=st.integers(0, 12), bucket=st.integers(1, 25))
@SETTINGS
def test_range_count_matches_duckdb_spec(spark, rows, half, bucket):
    """range_count_by_id (two-level prefix sum, operators/range_count)
    equals the naive pair-join spec on random tables with duplicate
    ids, tied timestamps, NEGATIVE times, probe points exactly on
    bucket boundaries, and bucket widths far below the 2*half balance
    guideline (correctness must hold for ANY positive bucket)."""
    import duckdb

    from event_stream_for_k8s_spark.operators.range_count import (
        range_count_by_id,
    )

    df = spark.createDataFrame(rows, "id long, t long")
    got = sorted(
        (r["id"], r["n_nearby"])
        for r in range_count_by_id(
            df, id_col="id", t_col="t", half=half, bucket=bucket
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (id BIGINT, t BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    want = con.execute(
        """
SELECT a.id, count(*) AS n
FROM e a JOIN e b
  ON b.t BETWEEN a.t - ? AND a.t + ? AND b.id <> a.id
GROUP BY a.id ORDER BY a.id
""",
        [half, half],
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_range_count_generic_over_string_id(spark):
    """range_count_by_id is generic over id_col type (ADVICE r08: the
    anchor/seed null-id filler rows must derive their cast from the
    caller's schema, not a hard-coded bigint — a string id would have
    been silently coerced or failed analysis in the unionByName).
    Pin the string-id path against the hand-computed spec."""
    from event_stream_for_k8s_spark.operators.range_count import (
        range_count_by_id,
    )

    rows = [("a", 0), ("b", 3), ("c", 10), ("a", 11), ("d", 12)]
    df = spark.createDataFrame(rows, "id string, t long")
    got = {
        (r["id"], r["n_nearby"])
        for r in range_count_by_id(
            df, id_col="id", t_col="t", half=4, bucket=8
        ).collect()
    }
    # pairs within |dt|<=4, different id: (a0,b3), (c10,a11), (c10,d12),
    # (a11,d12) — per-id other-row counts:
    assert got == {("a", 3), ("b", 1), ("c", 2), ("d", 2)}
    assert dict(df.dtypes)["id"] == "string"


merge_tables = st.tuples(
    # base: (key-or-NULL, payload-or-NULL); keys may repeat
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 8)),
            st.one_of(st.none(), st.integers(-9, 9)),
        ),
        min_size=0,
        max_size=25,
    ),
    # changes: same shape
    st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(0, 8)),
            st.one_of(st.none(), st.integers(-9, 9)),
        ),
        min_size=0,
        max_size=25,
    ),
)


@given(data=merge_tables)
@SETTINGS
def test_merge_upsert_matches_duckdb_spec(spark, data):
    """merge_upsert (full-outer + coalesce) equals DuckDB's identical
    SQL rewrite on random tables with NULL keys (must never match —
    both sides' NULL-key rows survive independently), duplicate keys
    (full-join pair expansion on both engines), and NULL change
    payloads (fall through to base via coalesce)."""
    import duckdb

    from event_stream_for_k8s_spark.operators.maintenance import (
        merge_upsert,
    )

    brows, crows = data
    schema = "k int, v long"
    base = spark.createDataFrame(brows, schema)
    changes = spark.createDataFrame(crows, schema)
    from collections import Counter

    got = Counter(
        (r["k"], r["v"])
        for r in merge_upsert(base, changes, ["k"]).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE b (k INT, v BIGINT)")
    con.execute("CREATE TABLE c (k INT, v BIGINT)")
    if brows:
        con.executemany("INSERT INTO b VALUES (?, ?)", brows)
    if crows:
        con.executemany("INSERT INTO c VALUES (?, ?)", crows)
    want = con.execute(
        """
SELECT coalesce(c.k, b.k) AS k, coalesce(c.v, b.v) AS v
FROM b FULL JOIN c ON b.k = c.k
"""
    ).fetchall()
    assert got == Counter(tuple(w) for w in want)


scd2_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 4)),  # key-or-NULL
        st.one_of(st.none(), st.integers(0, 20)),  # ts-or-NULL, ties likely
    ),
    min_size=1,
    max_size=30,
)


@given(rows=scd2_rows)
@SETTINGS
def test_scd2_matches_duckdb_spec(spark, rows):
    """scd2 (lead-per-key effective ranges) equals the DuckDB spec
    with the SAME pinned ordering (NULLS FIRST) on random inputs with
    NULL keys (one group), NULL effective dates (sort before all
    time — must NOT become the current row), and tied timestamps
    (tiebreak column decides)."""
    import duckdb

    from event_stream_for_k8s_spark.operators.maintenance import scd2

    data = [(k, t, i) for i, (k, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, ts long, rid long")
    from collections import Counter

    got = Counter(
        (r["k"], r["rid"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2(df, keys=["k"], ts_col="ts", tiebreak="rid").collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE e (k INT, ts BIGINT, rid BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", data)
    want = con.execute(
        """
SELECT k, rid, ts AS valid_from,
       lead(ts) OVER (PARTITION BY k
                      ORDER BY ts NULLS FIRST, rid NULLS FIRST) AS valid_to,
       (lead(ts) OVER (PARTITION BY k
                       ORDER BY ts NULLS FIRST, rid NULLS FIRST) IS NULL)
         AS is_current
FROM e
"""
    ).fetchall()
    assert got == Counter(tuple(w) for w in want)


cc_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)),
    min_size=0,
    max_size=30,
)


@given(edges=cc_edges)
@SETTINGS
def test_connected_components_matches_union_find_edges(spark, edges):
    """connected_components (iterative min-label + pointer jumping)
    equals a pure-Python union-find on adversarial edge lists:
    self-loops, duplicate and reversed edges, long chains (pointer
    jumping must still converge inside max_iter via O(log d) rounds),
    and isolated nodes supplied via the nodes relation.

    Named distinctly from test_connected_components_matches_union_find
    (the cc_graphs variant above, which additionally feeds isolated
    node ids outside the edge domain) — a same-name redefinition
    would shadow the earlier test and pytest would silently drop it.
    """
    from event_stream_for_k8s_spark.operators.dedup import (
        connected_components,
    )

    N = 13
    parent = list(range(N))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # min reachable node id per component (union-find roots are not
    # guaranteed minimal under this union rule, so normalize)
    comp: dict[int, list[int]] = {}
    for v in range(N):
        comp.setdefault(find(v), []).append(v)
    want = {
        v: min(members) for members in comp.values() for v in members
    }

    nodes = spark.createDataFrame([(v,) for v in range(N)], "node long")
    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.filter("src < 0")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(e, nodes=nodes).collect()
    }
    assert got == want


win_rows = st.lists(
    st.integers(-100, 100),  # epoch-seconds-ish ticks, negatives incl.
    min_size=1,
    max_size=50,
)


@given(
    ts=win_rows,
    width_slide=st.tuples(
        st.integers(1, 20), st.integers(1, 20)
    ).filter(lambda p: p[1] <= p[0]),
)
@SETTINGS
def test_window_assignment_matches_reference(spark, ts, width_slide):
    """F.window (the primitive under stream_tumbling / stream_sliding
    and the batch rollup twins) assigns rows to [start, start+width)
    windows aligned to the epoch with the given slide — verified
    against a pure-Python reference on random timestamps including
    NEGATIVE epochs (pre-1970 alignment is where floor-vs-truncate
    bugs live), window boundaries (t == start and t == end - 1 in,
    t == end out), and slides that divide/don't divide the width.
    Covers the whole tumbling case via slide == width."""
    width, slide = width_slide

    def ref() -> dict[tuple[int, int], int]:
        want: dict[tuple[int, int], int] = {}
        for t in ts:
            # window starts are slide-aligned to the epoch; t belongs
            # to every window with start in (t - width, t]
            first = (t // slide) * slide  # floor-aligned, negatives ok
            s = first
            while s > t - width:
                if s <= t < s + width:
                    want[(s, s + width)] = want.get((s, s + width), 0) + 1
                s -= slide
        return want

    df = spark.createDataFrame(
        [(t,) for t in ts], "t long"
    ).select(F.timestamp_seconds("t").alias("ts"))
    got = {
        (
            int(r["window"]["start"].timestamp()),
            int(r["window"]["end"].timestamp()),
        ): r["n"]
        for r in df.groupBy(
            F.window("ts", f"{width} seconds", f"{slide} seconds")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == ref()

session_events = st.lists(
    st.tuples(
        st.integers(0, 3),  # user key — few keys so sessions collide
        st.integers(0, 120),  # epoch-seconds tick
    ),
    min_size=1,
    max_size=50,
)


@given(events=session_events, gap=st.integers(1, 15))
@example(events=[(0, 0), (0, 1)], gap=1)  # diff == gap: MERGES
@example(events=[(0, 0), (0, 2)], gap=1)  # diff == gap + 1: splits
@SETTINGS
def test_session_window_matches_merge_reference(spark, events, gap):
    """F.session_window (the primitive under stream_session) merges an
    event at t into the previous session iff t <= prev_last + gap —
    a difference of EXACTLY gap still MERGES (adjacent [t, t+gap)
    windows coalesce), verified empirically: (0,1) gap=1 -> one
    session [0,2), (0,2) gap=1 -> two sessions. This matches both the
    lag-based sessionizer above and stream_session's gaps-and-islands
    oracle (`diff > gap` starts a new session). The spec originally
    encoded the exclusive reading (`<`), and hypothesis only surfaced
    the diff == gap counterexample in a later run — hence the pinned
    @example boundary cases; verified against a pure-Python
    sweep-merge on random ticks with duplicate timestamps and
    multi-user interleaving."""

    def ref() -> dict[tuple[int, int, int], int]:
        # (user, session_start, session_end) -> event count
        out: dict[tuple[int, int, int], int] = {}
        by_user: dict[int, list[int]] = {}
        for u, t in events:
            by_user.setdefault(u, []).append(t)
        for u, ts in by_user.items():
            ts.sort()
            start, last, n = ts[0], ts[0], 0
            for t in ts:
                if t <= last + gap:  # inclusive: diff == gap merges
                    n += 1
                    last = max(last, t)
                else:
                    if n:
                        out[(u, start, last + gap)] = n
                    start, last, n = t, t, 1
            out[(u, start, last + gap)] = n
        return out

    df = spark.createDataFrame(
        events, "u int, t long"
    ).select("u", F.timestamp_seconds("t").alias("ts"))
    got = {
        (
            r["u"],
            int(r["session_window"]["start"].timestamp()),
            int(r["session_window"]["end"].timestamp()),
        ): r["n"]
        for r in df.groupBy(
            "u", F.session_window("ts", f"{gap} seconds")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == ref()


range_frame_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # partition key
        st.integers(-20, 20),  # order value (negatives + duplicates)
    ),
    min_size=1,
    max_size=60,
)


@given(
    rows=range_frame_rows,
    lo=st.integers(0, 8),
    hi=st.integers(0, 8),
)
@SETTINGS
def test_range_frame_matches_value_reference(spark, rows, lo, hi):
    """RANGE BETWEEN lo PRECEDING AND hi FOLLOWING (win_frame_range's
    frame shape) counts rows by VALUE distance, tie-insensitively:
    every row with the same order value gets the same count, and the
    frame is the closed interval [v - lo, v + hi]. Verified against a
    brute-force spec on random rows with duplicate and negative order
    values — duplicates are where a ROWS-frame confusion would show."""
    from pyspark.sql.window import Window

    def ref() -> list[tuple[int, int, int]]:
        out = []
        for k, v in rows:
            n = sum(
                1
                for k2, v2 in rows
                if k2 == k and v - lo <= v2 <= v + hi
            )
            out.append((k, v, n))
        return sorted(out)

    df = spark.createDataFrame(rows, "k int, v int")
    w = Window.partitionBy("k").orderBy("v").rangeBetween(-lo, hi)
    got = sorted(
        (r["k"], r["v"], r["n"])
        for r in df.select(
            "k", "v", F.count("*").over(w).alias("n")
        ).collect()
    )
    assert got == ref()

interp_obs = st.lists(
    st.tuples(
        st.integers(0, 2),  # series key
        st.integers(0, 15),  # tick
        st.integers(-50, 50),  # observed value (ints => exact doubles)
    ),
    min_size=0,
    max_size=30,
)


@given(obs=interp_obs, span=st.integers(0, 15))
@SETTINGS
def test_interp_linear_matches_python_reference(spark, obs, span):
    """interp_linear (the core of ts_interp_linear) against an
    independent pure-Python spec on adversarial grids: series with NO
    observations (stay NULL), a single observation (clamps both ways),
    edge-only observations, duplicate observations at one tick (last
    write on the grid build wins before the operator runs — we dedup
    to make the input well-formed), and interior gaps. The spec
    mirrors the documented association order pv + (nv-pv)*((t-ph)/
    (nh-ph)) so doubles compare EXACTLY, not approximately."""
    from event_stream_for_k8s_spark.operators.timeseries import interp_linear

    # well-formed grid input: one value per (key, tick), ticks 0..span
    seen: dict[tuple[int, int], int] = {}
    for k, t, v in obs:
        if t <= span:
            seen[(k, t)] = v
    grid_rows = [
        (k, t, float(seen[(k, t)]) if (k, t) in seen else None)
        for k in (0, 1, 2)
        for t in range(span + 1)
    ]

    def ref() -> dict[tuple[int, int], float | None]:
        out: dict[tuple[int, int], float | None] = {}
        for k in (0, 1, 2):
            ticks = sorted(t for (k2, t) in seen if k2 == k)
            for t in range(span + 1):
                if (k, t) in seen:
                    out[(k, t)] = float(seen[(k, t)])
                    continue
                prev = max((x for x in ticks if x < t), default=None)
                nxt = min((x for x in ticks if x > t), default=None)
                if prev is None and nxt is None:
                    out[(k, t)] = None
                elif prev is None:
                    out[(k, t)] = float(seen[(k, nxt)])
                elif nxt is None:
                    out[(k, t)] = float(seen[(k, prev)])
                else:
                    pv, nv = float(seen[(k, prev)]), float(seen[(k, nxt)])
                    out[(k, t)] = pv + (nv - pv) * (
                        float(t - prev) / float(nxt - prev)
                    )
        return out

    df = spark.createDataFrame(
        grid_rows, "k int, t long, v double"
    )
    got = {
        (r["k"], r["t"]): r["v_interp"]
        for r in interp_linear(df, "k", "t", "v").collect()
    }
    assert got == ref()

skew_left = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),  # join/group key, NULLs
        st.integers(0, 10**6),  # entropy column
        st.integers(-5, 5),  # payload
    ),
    min_size=1,
    max_size=40,
)
skew_right = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 3)),  # key, NULLs + dups
        st.integers(-5, 5),  # right payload
    ),
    min_size=0,
    max_size=10,
)


@given(left=skew_left, right=skew_right, n=st.integers(1, 5))
@SETTINGS
def test_salting_is_invisible(spark, left, right, n):
    """operators/skew.py must be a pure physical rewrite: salted_count
    equals the plain groupBy count and salted_join equals the plain
    inner join for ANY input — NULL keys (match nothing, count under
    their own group), duplicate right keys (row multiplication must
    survive the n-way explode exactly once), any salt fan-out n
    including 1. Counter-compare because rows legitimately repeat."""
    from collections import Counter

    from event_stream_for_k8s_spark.operators.skew import (
        salted_count,
        salted_join,
    )

    l = spark.createDataFrame(left, "k int, e long, v int")
    r = spark.createDataFrame(right, "k int, w int")

    got_cnt = Counter(
        (row["k"], row["n"])
        for row in salted_count(l, ["k"], "e", n).collect()
    )
    want_cnt = Counter(
        (row["k"], row["n"])
        for row in l.groupBy("k").agg(F.count("*").alias("n")).collect()
    )
    assert got_cnt == want_cnt

    got_join = Counter(
        map(tuple, salted_join(l, r, ["k"], "e", n).collect())
    )
    want_join = Counter(map(tuple, l.join(r, ["k"]).collect()))
    assert got_join == want_join

streak_days = st.lists(
    st.tuples(
        st.integers(0, 2),  # user key
        st.integers(0, 25),  # day offset from 2024-01-01
    ),
    min_size=1,
    max_size=50,
    unique=True,
)


@given(days=streak_days)
@SETTINGS
def test_streak_runs_matches_direct_spec(spark, days):
    """streak_runs (the gaps-and-islands core of ts_streaks) against a
    DIRECT consecutive-run scan — independent of the date-minus-
    row_number anchor trick the operator AND its DuckDB oracle both
    use, so a shared misconception in that formulation would slip the
    oracle but not this. Random day sets per user: singleton runs,
    full-range runs, gap-of-one boundaries."""
    import datetime as dt

    from event_stream_for_k8s_spark.operators.timeseries import streak_runs

    base = dt.date(2024, 1, 1)

    def ref() -> list[tuple[int, int, str]]:
        out = []
        by_user: dict[int, list[int]] = {}
        for u, d in days:
            by_user.setdefault(u, []).append(d)
        for u, ds in by_user.items():
            ds.sort()
            start = prev = ds[0]
            for d in ds[1:]:
                if d == prev + 1:
                    prev = d
                    continue
                out.append((u, prev - start + 1,
                            str(base + dt.timedelta(days=start))))
                start = prev = d
            out.append((u, prev - start + 1,
                        str(base + dt.timedelta(days=start))))
        return sorted(out)

    df = spark.createDataFrame(
        [(u, base + dt.timedelta(days=d)) for u, d in days],
        "u int, d date",
    )
    got = sorted(
        (r["u"], r["len"], str(r["streak_start"]))
        for r in streak_runs(df, "u", "d").collect()
    )
    assert got == ref()

funnel_events = st.lists(
    st.tuples(
        st.integers(0, 2),  # user
        st.sampled_from(["view", "click", "purchase", "other"]),
        st.integers(0, 12),  # time tick (micros) — small => many ties
    ),
    min_size=1,
    max_size=40,
)


@given(events=funnel_events, window=st.integers(0, 6))
@SETTINGS
def test_funnel_stages_matches_direct_spec(spark, events, window):
    """funnel_stages (ts_funnel's single-pass core) against a direct
    per-user spec: first view, first click AT-OR-AFTER it, first
    purchase in [t_click, t_click + window]. Tiny tick range forces
    the tie cases the fixtures never hit — click and view at the SAME
    micro (inclusive: click qualifies), purchase exactly at
    t_click + window (in) and window + 1 (out), clicks before any
    view, stage events interleaved across users, window == 0."""
    from event_stream_for_k8s_spark.operators.timeseries import (
        funnel_stages,
    )

    def ref() -> dict[int, tuple]:
        out = {}
        by_user: dict[int, list] = {}
        for i, (u, ty, t) in enumerate(events):
            by_user.setdefault(u, []).append((ty, t))
        for u, evs in by_user.items():
            tv = min((t for ty, t in evs if ty == "view"), default=None)
            tc = (
                min(
                    (t for ty, t in evs if ty == "click" and t >= tv),
                    default=None,
                )
                if tv is not None
                else None
            )
            tb = (
                min(
                    (
                        t
                        for ty, t in evs
                        if ty == "purchase"
                        and tc <= t <= tc + window
                    ),
                    default=None,
                )
                if tc is not None
                else None
            )
            out[u] = (tv, tc, tb)
        return out

    df = spark.createDataFrame(
        [(u, ty, f"e{i}", t) for i, (u, ty, t) in enumerate(events)],
        "user_id int, event_type string, event_id string, t long",
    )
    got = {
        r["user_id"]: (r["t_view"], r["t_click"], r["t_buy"])
        for r in funnel_stages(df, window).collect()
    }
    assert got == ref()

minhash_docs = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=24),
    min_size=1,
    max_size=12,
)


@given(docs=minhash_docs, bands=st.sampled_from([1, 2, 4, 8]))
@SETTINGS
def test_minhash_banding_matches_brute_spec(spark, docs, bands):
    """The LSH banding/join/estimate stage of minhash_pairs_native
    against a brute-force Python spec over the SAME signatures
    (minhash_signatures is the shared input): a pair is a candidate
    iff some band's rows_per_band-slice matches EXACTLY, and survives
    iff round(matches/num_hashes, 6) >= threshold. Catches band-slice
    off-by-ones (element_at is 1-indexed) that planted-recall tests
    only see as gradual recall loss. Tiny 'ab '-alphabet docs force
    shared shingles, identical docs, and sub-shingle docs that drop."""
    from event_stream_for_k8s_spark.operators.similarity import (
        minhash_pairs_native,
        minhash_signatures,
    )

    num_hashes, shingle, thr = 8, 2, 0.3
    rpb = num_hashes // bands
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    sigs = {
        r["doc_id"]: list(r["sig"])
        for r in minhash_signatures(
            df, "doc_id", "text", shingle, num_hashes
        ).collect()
    }

    def ref() -> set[tuple[int, int, float]]:
        out = set()
        ids = sorted(sigs)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                sa, sb = sigs[a], sigs[b]
                if not any(
                    sa[i * rpb : (i + 1) * rpb] == sb[i * rpb : (i + 1) * rpb]
                    for i in range(bands)
                ):
                    continue
                j = round(
                    sum(u == v for u, v in zip(sa, sb)) / num_hashes, 6
                )
                if j >= thr:
                    out.add((a, b, j))
        return out

    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in minhash_pairs_native(
            df,
            "doc_id",
            "text",
            shingle=shingle,
            num_hashes=num_hashes,
            bands=bands,
            est_threshold=thr,
        ).collect()
    }
    assert got == ref()


token_budget_rows = st.lists(
    st.integers(1, 8),  # ntok per doc: small values force boundary ties
    min_size=0,
    max_size=40,
)


@given(ntoks=token_budget_rows, budget=st.integers(0, 60))
@example(ntoks=[3, 3, 3], budget=6)   # boundary length with ties, k=2
@example(ntoks=[3, 3, 3], budget=9)   # cum == budget exactly: all in
@example(ntoks=[5, 1], budget=4)      # first doc alone overflows
@example(ntoks=[2, 2, 2], budget=0)   # zero budget selects nothing
@SETTINGS
def test_token_budget_head_matches_greedy_prefix(spark, ntoks, budget):
    """token_budget_head (llm_token_budget's core) derives the greedy
    (ntok DESC, doc_id ASC) budget prefix from the distinct-length
    histogram — no global window. The pure-Python spec IS the global
    running sum the oracle states: walk docs in greedy order, stop at
    the first row whose cumulative ntok exceeds the budget (a prefix
    cut, not a skip-and-continue knapsack). Equality must hold through
    boundary-length ties (several docs share the cut length), an
    exactly-full budget (cum == budget), and a first doc that alone
    overflows."""
    from event_stream_for_k8s_spark.operators.corpus import token_budget_head

    rows = [(i, n) for i, n in enumerate(ntoks)]

    def ref() -> set[int]:
        sel, cum = set(), 0
        for doc_id, n in sorted(rows, key=lambda r: (-r[1], r[0])):
            if cum + n > budget:
                break
            cum += n
            sel.add(doc_id)
        return sel

    df = spark.createDataFrame(
        rows or [(0, 1)], "doc_id long, ntok long"
    )
    if not rows:
        df = df.filter(F.lit(False))
    out = token_budget_head(df, budget)
    got = {r["doc_id"] for r in out.collect()}
    # caller-owned cache lifetime (ADVICE r08): release the persisted
    # per-doc relation via the documented handle so ~100 hypothesis
    # examples don't accumulate cached relations in one session
    out.cached_input.unpersist()
    assert got == ref()


# Printable ASCII, where Java and Python regex/ascii() semantics are
# provably identical (unicode \w classes differ between engines and
# the corpus contract is ASCII-normalized text).
ascii_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    max_size=6,
)


@given(toks=st.lists(ascii_token, min_size=0, max_size=8))
@example(toks=[""])          # sequence(1,0) reverses to [1,0] in Spark
@example(toks=["", "", ""])  # a full 3-window of empty tokens
@SETTINGS
def test_token_hash_and_fingerprint_match_python_reference(spark, toks):
    """token_hash (the 31-radix polynomial under every shingle/gram
    operator) and fingerprint_minhash3 vs a pure-Python replay. The
    empty-token edge is load-bearing: Spark's sequence(1, length)
    REVERSES to [1, 0] for '' (two phantom chars), but ascii('') = 0
    keeps the polynomial at 0 — the same value DuckDB's empty
    list_reduce produces. A refactor that changes the base or the
    fold direction would surface here first. Docs shorter than 3
    tokens fingerprint to NULL in both."""
    from event_stream_for_k8s_spark.functions.text import (
        MOD,
        fingerprint_minhash3,
        token_hash,
    )

    def py_hash(t: str) -> int:
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % MOD
        return acc

    def py_fingerprint() -> int | None:
        if len(toks) < 3:
            return None
        h = [py_hash(t) for t in toks]
        wins = [
            ((h[i] * 31 + h[i + 1]) % MOD * 31 + h[i + 2]) % MOD
            for i in range(len(h) - 2)
        ]
        return min(wins)

    df = spark.createDataFrame([(toks,)], "t array<string>")
    row = df.select(
        F.transform("t", token_hash).alias("h"),
        fingerprint_minhash3(F.col("t")).alias("fp"),
    ).collect()[0]
    assert row["h"] == [py_hash(t) for t in toks]
    assert row["fp"] == py_fingerprint()


quality_text = st.text(
    alphabet=" \tabcdeTHE.,;!0#the ",
    max_size=40,
)


@given(text=quality_text)
@example(text="")          # NULL ratios (try_divide), 1 empty token
@example(text="  ")        # whitespace-only: ['', ''] token split
@example(text="the the")   # all-stopword
@SETTINGS
def test_quality_features_match_python_reference(spark, text):
    """quality_features vs a pure-Python re-implementation over ASCII
    text with leading/trailing/multiple whitespace (where split(\\s+)
    emits empty tokens in BOTH engines), punctuation runs, and
    stopword-only docs. Ratios are IEEE double divisions in both
    runtimes, so equality is exact; empty text yields NULL ratios
    (the try_divide parity semantics)."""
    import re

    from event_stream_for_k8s_spark.functions.text import (
        STOPWORDS,
        quality_features,
    )

    toks = re.split(r"\s+", text)
    n_tok = len(toks)
    n_chars = len(text)
    n_punct = len(re.findall(r"[^\w\s]", text))
    n_stop = sum(t in STOPWORDS for t in toks)

    def div(a, b):
        return a / b if b else None

    f = quality_features(F.col("text"))
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            f["n_chars"].alias("n_chars"),
            f["n_tokens"].alias("n_tokens"),
            f["punct_ratio"].alias("punct_ratio"),
            f["stopword_ratio"].alias("stopword_ratio"),
            f["avg_token_len"].alias("avg_token_len"),
        )
        .collect()[0]
    )
    assert row["n_chars"] == n_chars
    assert row["n_tokens"] == n_tok
    assert row["punct_ratio"] == div(float(n_punct), n_chars)
    assert row["stopword_ratio"] == div(float(n_stop), n_tok)
    assert row["avg_token_len"] == div(float(n_chars - n_tok + 1), n_tok)


@given(text=st.text(alphabet="aB z09.#-", max_size=30))
@example(text="aB1.")   # lowercase fold + digit run + punct
@example(text="   ")    # spaces match nothing in the BPE class
@SETTINGS
def test_bpe_ish_tokens_match_python_reference(spark, text):
    """bpe_ish_tokens (the BPE-style pre-tokenizer under llm_bpe_pairs
    and the tokenizer-coverage audit) vs Python re.findall of the same
    pattern on lowercased text — letter runs, digit runs, single
    punctuation, spaces dropped. Java and Python alternation pick the
    leftmost-longest identically for this pattern on ASCII."""
    import re

    from event_stream_for_k8s_spark.functions.text import (
        BPE_RE,
        bpe_ish_tokens,
    )

    expect = re.findall(BPE_RE, text.lower())
    row = (
        spark.createDataFrame([(text,)], "text string")
        .select(bpe_ish_tokens(F.col("text")).alias("t"))
        .collect()[0]
    )
    assert row["t"] == expect


bpe_words = st.lists(
    st.text(alphabet="ab", min_size=2, max_size=8),
    min_size=1,
    max_size=15,
)


def _py_bpe_apply(merges, word: str) -> list[str]:
    """Shared pure-Python spec: greedy left-to-right non-overlapping
    apply of a trained merge table, merge by merge in training order
    (the reference both encode differentials pin against)."""
    s = list(word)
    for _, a, b, _ in merges:
        ns, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                ns.append(a + b)
                i += 2
            else:
                ns.append(s[i])
                i += 1
        s = ns
    return s


@given(words=bpe_words, rounds=st.integers(1, 4))
@example(words=["aaaa"], rounds=2)       # self-pair run: (a,a) -> [aa,aa]
@example(words=["ab", "ab", "ba"], rounds=3)  # tie-break + exhaustion
@SETTINGS
def test_bpe_train_matches_python_reference(spark, words, rounds):
    """bpe_train (operators/corpus, llm_bpe_train's core) equals a
    pure-Python BPE trainer on random two-letter corpora: per round
    the (count DESC, SEP-joined-key ASC) winner, greedy left-to-right
    non-overlapping merge (runs of a self-pair merge in strict pairs),
    early stop when no pair remains. The tiny alphabet maximizes
    collisions, ties, and multi-round self-pair interactions the
    documents fixture cannot force."""
    from event_stream_for_k8s_spark.operators.corpus import (
        BPE_SEP,
        bpe_symbolize,
        bpe_train,
    )

    def ref() -> list[tuple[int, str, str, int]]:
        seqs = [list(w) for w in words]
        merges: list[tuple[int, str, str, int]] = []
        for r in range(rounds):
            from collections import Counter

            c: Counter = Counter()
            for s in seqs:
                for i in range(len(s) - 1):
                    c[(s[i], s[i + 1])] += 1
            if not c:
                break
            (a, b), n = min(
                c.items(),
                key=lambda kv: (-kv[1], kv[0][0] + BPE_SEP + kv[0][1]),
            )
            merges.append((r, a, b, n))
            nxt = []
            for s in seqs:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                nxt.append(ns)
            seqs = nxt
        return merges

    df = spark.createDataFrame([(w,) for w in words], "lw string").select(
        bpe_symbolize(F.col("lw")).alias("w")
    )
    assert bpe_train(df, rounds) == ref()


@given(words=bpe_words, rounds=st.integers(1, 4))
@example(words=["aaaa"], rounds=2)
@example(words=["ab", "ab", "ba"], rounds=3)
@SETTINGS
def test_bpe_train_local_equals_distributed(spark, words, rounds):
    """The r15 driver-side fast path (histogram under
    SPARK_GRAFT_BPE_LOCAL_VOCAB_CAP collected and trained locally)
    must produce the SAME merge table as the distributed rounds —
    cap=0 forces the distributed path on the identical input. Covers
    both bpe_train and bpe_train_batched (the batched contract's
    acceptance window and rank-order application included)."""
    import os

    from event_stream_for_k8s_spark.operators.corpus import (
        bpe_symbolize,
        bpe_train,
        bpe_train_batched,
    )

    df = spark.createDataFrame([(w,) for w in words], "lw string").select(
        bpe_symbolize(F.col("lw")).alias("w")
    )
    local_seq = bpe_train(df, rounds)
    local_bat = bpe_train_batched(df, rounds, batch=2, candidates=8)
    os.environ["SPARK_GRAFT_BPE_LOCAL_VOCAB_CAP"] = "0"
    try:
        assert bpe_train(df, rounds) == local_seq
        assert bpe_train_batched(df, rounds, batch=2, candidates=8) == local_bat
    finally:
        del os.environ["SPARK_GRAFT_BPE_LOCAL_VOCAB_CAP"]


@given(words=bpe_words, rounds=st.integers(1, 4))
@example(words=["aaaa"], rounds=2)
@example(words=["ab", "ab", "ba"], rounds=3)
@SETTINGS
def test_bpe_hist_passthrough_equivalence(spark, words, rounds):
    """The r15 O5 shared-histogram plumbing must be a pure plan
    optimization: training off a caller-built bpe_word_hist (hist=),
    encoding through a caller-passed vocabulary (vocab=), and joining
    bpe_word_ntok's per-word counts must all equal the self-contained
    forms on the same corpus — merge table, rewritten occurrences,
    per-doc id sequences, and token counts alike."""
    from event_stream_for_k8s_spark.operators.corpus import (
        BPE_BOUND,
        bpe_apply_vocab,
        bpe_symbolize,
        bpe_token_ids,
        bpe_train,
        bpe_train_batched,
        bpe_word_hist,
        bpe_word_ntok,
    )

    docs = spark.createDataFrame(
        [(i % 3, i, w) for i, w in enumerate(words)],
        "doc_id long, wpos int, lw string",
    ).select("doc_id", "wpos", bpe_symbolize(F.col("lw")).alias("w"))
    hist = bpe_word_hist(docs.select("w")).persist()
    try:
        merges = bpe_train(docs.select("w"), rounds)
        assert bpe_train(docs.select("w"), rounds, hist=hist) == merges
        assert bpe_train_batched(
            docs.select("w"), rounds, batch=2, candidates=8, hist=hist
        ) == bpe_train_batched(docs.select("w"), rounds, batch=2, candidates=8)

        base = bpe_apply_vocab(docs, merges)
        via_vocab = bpe_apply_vocab(docs, merges, vocab=hist)
        key = lambda r: (r["doc_id"], r["wpos"])  # noqa: E731
        assert sorted(via_vocab.collect(), key=key) == sorted(
            base.collect(), key=key
        )

        ids_base = bpe_token_ids(docs, merges)
        ids_vocab = bpe_token_ids(docs, merges, vocab=hist)
        dkey = lambda r: r["doc_id"]  # noqa: E731
        assert sorted(ids_vocab.collect(), key=dkey) == sorted(
            ids_base.collect(), key=dkey
        )

        ntok = docs.join(bpe_word_ntok(hist, merges), "w").select(
            "doc_id", "wpos", F.col("__bpe_n").alias("n")
        )
        direct = base.select(
            "doc_id", "wpos", F.size(F.split("w", BPE_BOUND)).alias("n")
        )
        assert sorted(ntok.collect(), key=key) == sorted(
            direct.collect(), key=key
        )
    finally:
        hist.unpersist()


def _py_bpe_train_batched(words, rounds, batch, candidates):
    """Pure-Python spec of the batched trainer's contract: per batch
    round, rank by (count DESC, key ASC), greedy-accept up to the
    static cap from the top-``candidates`` window rejecting symbol
    overlap with accepted inputs OR outputs, apply accepted merges
    sequentially in rank order."""
    import math
    from collections import Counter

    from event_stream_for_k8s_spark.operators.corpus import BPE_SEP

    seqs = [list(w) for w in words]
    merges: list[tuple[int, str, str, int]] = []
    for t in range(math.ceil(rounds / batch)):
        cap = min(batch, rounds - t * batch)
        c: Counter = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                c[(s[i], s[i + 1])] += 1
        if not c:
            break
        ranked = sorted(
            c.items(),
            key=lambda kv: (-kv[1], kv[0][0] + BPE_SEP + kv[0][1]),
        )[:candidates]
        used: set = set()
        accepted = []
        for (a, b), n in ranked:
            if len(accepted) >= cap:
                break
            if a in used or b in used:
                continue
            used.update((a, b, a + b))
            accepted.append((a, b, n))
        for a, b, n in accepted:
            merges.append((len(merges), a, b, n))
        for a, b, _ in accepted:
            nxt = []
            for s in seqs:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                nxt.append(ns)
            seqs = nxt
    return merges


@given(words=bpe_words, rounds=st.integers(1, 4))
@example(words=["aaaa"], rounds=2)
@example(words=["ab", "ab", "ba"], rounds=3)
@SETTINGS
def test_bpe_train_batched_b1_equals_sequential(spark, words, rounds):
    """bpe_train_batched(batch=1) must equal bpe_train round for
    round (VERDICT r11 #4's required differential): with B=1 the
    greedy window always accepts exactly rank 1 — the sequential
    winner — and the composed replace chain degenerates to the
    one-merge rewrite."""
    from event_stream_for_k8s_spark.operators.corpus import (
        bpe_symbolize,
        bpe_train,
        bpe_train_batched,
    )

    df = spark.createDataFrame([(w,) for w in words], "lw string").select(
        bpe_symbolize(F.col("lw")).alias("w")
    )
    assert bpe_train_batched(df, rounds, batch=1) == bpe_train(df, rounds)


@given(
    words=bpe_words,
    rounds=st.integers(1, 6),
    batch=st.integers(2, 3),
    candidates=st.integers(2, 6),
)
@example(words=["aaaa", "abab"], rounds=4, batch=2, candidates=4)
@example(words=["ab", "ba", "aabb"], rounds=6, batch=3, candidates=2)
@SETTINGS
def test_bpe_train_batched_matches_python_spec(
    spark, words, rounds, batch, candidates
):
    """Batched-trainer differential against an independent pure-Python
    implementation of the same contract, with SMALL candidate windows
    so the window truncation, conflict rejection (including the
    merged-OUTPUT exclusion) and static per-round caps all get
    exercised on adversarial two-letter corpora."""
    from event_stream_for_k8s_spark.operators.corpus import (
        bpe_symbolize,
        bpe_train_batched,
    )

    df = spark.createDataFrame([(w,) for w in words], "lw string").select(
        bpe_symbolize(F.col("lw")).alias("w")
    )
    assert bpe_train_batched(
        df, rounds, batch=batch, candidates=candidates
    ) == _py_bpe_train_batched(words, rounds, batch, candidates)


@given(words=bpe_words, rounds=st.integers(1, 4))
@example(words=["aaaa", "aaa"], rounds=3)   # self-pair runs through rounds
@example(words=["ab", "ab", "abab"], rounds=2)  # merged symbol re-pairs
@SETTINGS
def test_bpe_encode_matches_python_apply(spark, words, rounds):
    """ENCODE differential (VERDICT r09 #6): applying the trained
    merge table through the chained _bpe_merge_word string folds —
    the encode path of llm_bpe_encode and llm_bpe_encode_docs —
    yields, for every word, exactly the symbol sequence a pure-Python
    greedy left-to-right apply of the same table produces, merge by
    merge in training order (multi-char symbols re-pairing in later
    rounds included). The trainer differential above pins WHICH table
    is learned; this pins what APPLYING it does."""
    from event_stream_for_k8s_spark.operators.corpus import (
        BPE_BOUND,
        _bpe_merge_word,
        bpe_symbolize,
        bpe_train,
    )

    df = spark.createDataFrame([(w,) for w in words], "lw string").select(
        bpe_symbolize(F.col("lw")).alias("w")
    )
    merges = bpe_train(df, rounds)
    enc = df
    for _, a, b, _ in merges:
        enc = enc.select(_bpe_merge_word(F.col("w"), a, b).alias("w"))
    got = sorted(r["w"].split(BPE_BOUND) for r in enc.collect())
    assert got == sorted(_py_bpe_apply(merges, w) for w in words)


pack_lens = st.lists(
    st.tuples(
        st.integers(0, 40),        # doc_id universe (collision-free below)
        st.integers(1, 700),       # n_tok, including > 512 oversized
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(docs=pack_lens)
@example(docs=[(0, 700)])                 # oversized rides alone, pad 0
@example(docs=[(8, 5)])                   # one-doc shard: solo middle
@example(docs=[(0, 256), (8, 256)])       # exact-fit pair at the cap
@SETTINGS
def test_pack_pairs_matches_python_fold(spark, docs):
    """pack_pairs (operators/corpus, llm_pack_pairs' core) against a
    pure-Python fold spec: per shard (doc_id % 8), sort by (n_tok
    desc, doc_id), pair rank r with rank m+1-r iff r != m+1-r and
    the sum fits 512; mate/seq/padding per doc. Random lengths
    include oversized (> 512) docs and single-doc shards the parquet
    fixture cannot force."""
    from event_stream_for_k8s_spark.operators.corpus import pack_pairs

    t = spark.createDataFrame(
        [(i, i % 8, n) for i, n in docs],
        "doc_id bigint, shard bigint, n_tok bigint",
    )
    result = pack_pairs(t, cap=512)
    got = {
        row["doc_id"]: (
            row["mate_id"],
            row["seq_tokens"],
            row["padding"],
        )
        for row in result.collect()
    }
    # caller-owned cache: release per example or the hypothesis loop
    # accumulates one persisted ranked relation per case
    result.cached_input.unpersist()

    expect = {}
    by_shard: dict[int, list[tuple[int, int]]] = {}
    for i, n in docs:
        by_shard.setdefault(i % 8, []).append((i, n))
    for members in by_shard.values():
        ranked = sorted(members, key=lambda t: (-t[1], t[0]))
        m = len(ranked)
        for idx, (i, n) in enumerate(ranked):
            j, nj = ranked[m - 1 - idx]
            if i != j and n + nj <= 512:
                expect[i] = (j, n + nj, max(0, 512 - n - nj))
            else:
                expect[i] = (None, n, max(0, 512 - n))
    assert got == expect


bpe_docs = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=2, max_size=8),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=5,
)


@given(docs=bpe_docs, rounds=st.integers(1, 4))
@example(docs=[["aaaa"], ["aa", "ab"]], rounds=3)
@SETTINGS
def test_bpe_token_ids_matches_python(spark, docs, rounds):
    """bpe_token_ids (llm_bpe_encode_docs' core) end to end against
    pure Python: per doc, the concatenated-in-word-order id sequence
    of the merge-table apply, ids assigned a/b -> 0/1 and merge round
    r -> 26+r with FIRST-round-wins on duplicate merged strings. Also
    pins that n_tok equals the parsed sequence length and that word
    order survives the collect_list/array_sort reassembly."""
    from event_stream_for_k8s_spark.operators.corpus import (
        bpe_symbolize,
        bpe_token_ids,
        bpe_train,
    )

    rows = [
        (i, j, w)
        for i, ws in enumerate(docs)
        for j, w in enumerate(ws)
    ]
    words = spark.createDataFrame(
        rows, "doc_id bigint, wpos int, lw string"
    ).select("doc_id", "wpos", bpe_symbolize(F.col("lw")).alias("w"))
    merges = bpe_train(words.select("w"), rounds)
    got = {
        r["doc_id"]: (r["n_tok"], r["token_ids"])
        for r in bpe_token_ids(words, merges).collect()
    }

    vocab: dict[str, int] = {}
    for r, a, b, _ in merges:
        vocab.setdefault(a + b, 26 + r)

    assert set(got) == set(range(len(docs)))
    for i, ws in enumerate(docs):
        syms = [s for w in ws for s in _py_bpe_apply(merges, w)]
        ids = [
            str(ord(s) - 97) if len(s) == 1 else str(vocab[s])
            for s in syms
        ]
        assert got[i] == (len(syms), ",".join(ids))


excise_docs = st.lists(
    st.lists(st.sampled_from(["a", "b"]), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


def _py_excise(docs, win, min_span):
    """Pure-Python spec of excise_dup_spans: corpus-wide window
    counts, per-doc consecutive-dup-window runs, excise tokens
    covered by runs spanning >= min_span."""
    from collections import Counter

    toks = {i: s.split(" ") for i, s in docs.items()}
    cnt = Counter()
    for tk in toks.values():
        for p in range(len(tk) - win + 1):
            cnt[" ".join(tk[p : p + win])] += 1
    out = {}
    for i, tk in toks.items():
        dup = [
            p
            for p in range(len(tk) - win + 1)
            if cnt[" ".join(tk[p : p + win])] >= 2
        ]
        excised: set[int] = set()
        run: list[int] = []

        def flush(run):
            if run and run[-1] + win - 1 - run[0] + 1 >= min_span:
                excised.update(range(run[0], run[-1] + win))

        for p in dup:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                flush(run)
                run = [p]
        flush(run)
        # spec positions are 0-based token indices
        kept = [x for j, x in enumerate(tk) if j not in excised]
        out[i] = (len(tk), len(tk) - len(kept), " ".join(kept))
    return out


@given(docs=excise_docs, min_span=st.integers(3, 6))
@example(
    docs=[["a", "b", "a", "b", "a", "b"], ["b", "a", "b", "a", "b"]],
    min_span=4,
)  # cross-doc shared span
@example(docs=[["a", "a", "a", "a", "a", "a", "a"]], min_span=4)
# self-repeat: every window duplicates within ONE doc
@example(docs=[["a", "b"]], min_span=3)  # too short for any window
@SETTINGS
def test_excise_dup_spans_matches_python(spark, docs, min_span):
    """excise_dup_spans (llm_dedup_excise's core) against a
    pure-Python excision spec on random 2-word-alphabet corpora:
    identical (n_tokens, n_excised, cleaned_text) per doc, with the
    window shrunk to 2 and the span threshold to 3-6 so duplicated
    runs actually occur. Exercises cross-doc duplication, within-doc
    self-repeats, runs that merge/abut, all-excised docs, and docs
    shorter than the window."""
    from event_stream_for_k8s_spark.plans.llm import excise_dup_spans

    corpus = {i: " ".join(ws) for i, ws in enumerate(docs)}
    df = spark.createDataFrame(
        list(corpus.items()), "doc_id bigint, text string"
    )
    rows = excise_dup_spans(df, win=2, min_span=min_span).collect()
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_excised"], r["cleaned_text"])
        for r in rows
    }
    expect = _py_excise(corpus, win=2, min_span=min_span)
    # split-on-space of "" yields [""] on both sides: a genuinely
    # empty doc is one empty token to the operator, as to the spec
    assert got == expect
