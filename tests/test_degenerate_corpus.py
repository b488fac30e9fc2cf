"""Totality sweep: every documents-reading query must survive — and
oracle-match on — a corpus of degenerate documents (empty text,
1-token, under-window, unicode, heavy repetition, exact dups).

The driver regenerates testdata between rounds; corpus shape is a
DATA property, not a contract (round-2 memory note). Round 3's first
run of this sweep caught 10 real ANSI/parity bugs: element_at and '/'
throwing where DuckDB yields NULL, a cast('') crash, byte-vs-codepoint
divergence in the multimodal oracles, and array_join('') vs NULL
signature serialization.
"""

from __future__ import annotations

import os

import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY
from event_stream_for_k8s_spark.testing.oracle import (
    check_query,
    connect_oracle,
)

from tests.conftest import SF_SMOKE

DEGEN_DOCS = [
    (1, "", "en", "web", 0),                       # empty text
    (2, "solo", "en", "web", 4),                   # 1 token
    (3, "solo", "en", "books", 4),                 # 1-token dup
    (4, "a b c d e f g", "de", "web", 13),         # under the 8-window
    (5, "héllo wörld ünïcode téxt hère tödäy ämäzing stüff", "de",
     "web", 49),
    (6, " ".join(["rep"] * 40), "en", "web", 159),  # heavy repetition
    (7, " ".join(f"w{i}" for i in range(64)), "en", "cc", 200),
    (8, " ".join(f"w{i}" for i in range(64)), "en", "cc", 200),  # dup
]

NAMES = sorted(
    n for n in REGISTRY
    if n.startswith("llm_")
    or n in ("join_fuzzy_blocked", "scan_text", "scan_binaryfile",
             "fn_array_setops")
)


@pytest.fixture(scope="module")
def degen_sf(spark, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("degen") / "sf")
    os.makedirs(sf)
    for t in TABLES:
        os.symlink(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    os.unlink(f"{sf}/documents.parquet")
    spark.createDataFrame(
        DEGEN_DOCS,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).toPandas().to_parquet(f"{sf}/documents.parquet", index=False)
    return sf


@pytest.fixture(scope="module")
def degen_con(degen_sf):
    con = connect_oracle(degen_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_degenerate_corpus(spark, degen_con, degen_sf, name):
    res = check_query(spark, degen_con, REGISTRY[name], degen_sf)
    assert res.ok, str(res)
