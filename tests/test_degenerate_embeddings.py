"""Totality sweep over the EMBEDDINGS-reading families: every query
that consumes the embeddings table must survive — and oracle-match
on — a degenerate vector table: zero-norm vectors (cosine 0/0),
exact duplicate vectors, a constant (all-equal-components) vector,
denormal-small magnitudes, negatives, and a label with a single
member (cluster-of-one).

Mirrors tests/test_degenerate_{events,corpus}.py (round-3 pattern:
the sweep on degenerate DOCUMENTS caught 10 ANSI/parity bugs; this
is the same net under the ANN/semantic-dedup tiers).
"""

from __future__ import annotations

import inspect
import math
import os

import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.testing.oracle import (
    check_query,
    connect_oracle,
)

from tests.conftest import SF_SMOKE

DIM = 64  # the testdata contract dimension (TESTDATA.md)


def _vec(seed: int) -> list[float]:
    # deterministic pseudo-vector, values in [-1, 1)
    return [
        math.sin(0.1 * seed + 0.37 * i) for i in range(DIM)
    ]


DEGEN_VECS = (
    [(1, [0.0] * DIM, 0)]                       # zero-norm (cosine 0/0)
    + [(2, [0.0] * DIM, 1)]                     # second zero, other label
    + [(3, [1.0] * DIM, 0)]                     # constant components
    + [(4, [1e-30] * DIM, 0)]                   # denormal-small norm
    + [(5, _vec(5), 0), (6, _vec(5), 0)]        # exact duplicates
    + [(7, [-x for x in _vec(5)], 0)]           # exact antipode
    + [(8, _vec(8), 2)]                         # label with ONE member
    + [(10 + i, _vec(10 + i), i % 2) for i in range(24)]  # filler
)

NAMES = sorted(
    n
    for n, q in REGISTRY.items()
    if "embeddings" in (q.oracle or "")
    or '"embeddings"' in inspect.getsource(q.spark)
)


@pytest.fixture(scope="module")
def degen_emb_sf(spark, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp("degenemb") / "sf")
    os.makedirs(sf)
    for t in TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    os.unlink(f"{sf}/embeddings.parquet")
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in DEGEN_VECS], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in DEGEN_VECS], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in DEGEN_VECS], pa.int32()),
        }
    )
    pq.write_table(tbl, f"{sf}/embeddings.parquet")
    return sf


@pytest.fixture(scope="module")
def degen_emb_con(degen_emb_sf):
    con = connect_oracle(degen_emb_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_degenerate_embeddings(spark, degen_emb_con, degen_emb_sf, name):
    res = check_query(spark, degen_emb_con, REGISTRY[name], degen_emb_sf)
    assert res.ok, str(res)
