"""Driver-gate twin: every registered query vs its DuckDB oracle at
sf0.001 (fast). The driver runs the same comparison at sf0.01."""

from __future__ import annotations

import pytest

from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.testing.oracle import check_query, connect_oracle

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def oracle_con():
    con = connect_oracle(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle_con, name):
    res = check_query(spark, oracle_con, REGISTRY[name], SF_SMOKE)
    assert res.ok, str(res)
    assert res.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names
