"""Oversized/degenerate-document regression net (VERDICT r06 #5).

The round-6 probe ran every `llm_*` query against a corpus containing
one 200 KB / ~30k-token document plus an empty document and found no
failures. This trimmed version pins that result so a future
token-explode regression (a quadratic shingle/pair construction, an
ANSI throw on the empty doc, a per-char blowup) fails CI instead of
reappearing silently.

Query set: the five slowest from the round-6 probe (linear-in-token
shingle work: winnow, substring profile, dsir, repetition,
boilerplate) plus five with the most token-shape-sensitive plans
(chunk/pack expand per token-window, tokens and bpe_pairs explode per
token, ngram novelty per shingle).

Totality + a generous wall cap are the contract — NOT oracle parity
(the probe corpus is synthetic, not part of the oracle fixture set).
Each query's full plan must execute and no query may take more than
120 s at this 502-row scale (the round-6 probe measured the slowest
at ~35-50 s, dominated by shingle counts; a quadratic regression on a
30k-token doc lands in minutes-to-hours).
"""

from __future__ import annotations

import os
import shutil
import time

import pytest

from event_stream_for_k8s_spark.catalog import TABLES
from event_stream_for_k8s_spark.plans import REGISTRY

from tests.conftest import SF_SMOKE

PROBE_QUERIES = [
    # five slowest in the round-6 full probe
    "llm_winnow",
    "llm_dedup_substring",
    "llm_dsir_weights",
    "llm_repetition",
    "llm_boilerplate",
    # five most token-shape-sensitive plans
    "llm_chunk",
    "llm_pack_sequences",
    "llm_tokens",
    "llm_bpe_pairs",
    "llm_ngram_novelty",
]


@pytest.fixture(scope="module")
def oversized_sf(tmp_path_factory, spark):
    """sf0.001 with the documents table replaced by base + one 200 KB
    (~30k-token) document + one empty document."""
    sf = str(tmp_path_factory.mktemp("oversf") / "sf")
    os.makedirs(sf)
    for t in TABLES:
        if t != "documents":
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", f"{sf}/{t}.parquet")
    base = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    # ~30k tokens / ~200 KB: realistic web-crawl outlier shape —
    # repeated vocabulary (shingle-heavy) with per-token variation
    big = " ".join(f"tok{i % 97} word{i}" for i in range(15000))
    extra = spark.createDataFrame(
        [
            (900001, big, "en", "probe", len(big)),
            (900002, "", "en", "probe", 0),
        ],
        schema=base.schema,
    )
    base.unionByName(extra).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )
    return sf


@pytest.mark.parametrize("name", PROBE_QUERIES)
def test_oversized_and_empty_doc(spark, oversized_sf, name):
    t0 = time.monotonic()
    REGISTRY[name].spark(spark, oversized_sf).count()
    elapsed = time.monotonic() - t0
    assert elapsed < 120, (
        f"{name} took {elapsed:.0f}s on a 502-row corpus with one "
        "30k-token doc — token-explode regression"
    )
