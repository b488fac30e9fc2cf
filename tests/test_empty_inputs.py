"""Totality net: every registered query must BUILD and EXECUTE on a
dataset where every table has ZERO rows.

Empty inputs are not an exotic fixture — at 100 TB they are a normal
serving state (a corpus filter that drops everything, a quiet
partition, an ANN cycle with nothing sampled). The first run of this
sweep (round 6) caught seven real crashes: driver-side 1.0/0 in
pagerank, an ANSI 0/0 in the docstats ratios, MLlib fits throwing on
empty corpora in all three ANN tiers, np.stack([]) in the PQ codebook
path, and the arrow-ipc sink committing zero schema-bearing files so
its own read-back failed.

Oracle parity is deliberately NOT asserted here: the fixture-deriving
scan/sink/stream families synthesize files whose oracles model
non-empty data, and GROUPING SETS on empty input is a documented
engine divergence (Spark omits the global () row DuckDB emits —
see agg_cube/agg_rollup notes). Totality — no crash — is the
contract this net enforces.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("emptysf") / "sf")
    os.makedirs(sf)
    for t in TABLES:
        tbl = pq.read_table(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(tbl.slice(0, 0), f"{sf}/{t}.parquet")
    return sf


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_total_on_empty_tables(spark, empty_sf, name):
    df = REGISTRY[name].spark(spark, empty_sf)
    df.count()  # executes the full plan; any throw fails the net
