"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``event_stream_for_k8s_spark`` — this module
only adapts the query registry (SURVEY.md §2 inventory) to the driver
contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from event_stream_for_k8s_spark.plans import REGISTRY  # noqa: E402

# The driver's correctness gate samples the first 50 queries in
# alphabetical order per round (CORRECTNESS_r01.json stops at
# `join_asof`). To get driver verdicts onto the rest of the registry,
# each round re-registers a rotating batch of not-yet-verified queries
# under early-sorting `a_chk_<name>` aliases (same callable, same
# oracle SQL — pure duplicates, suggested by VERDICT r01 "Next round"
# #2). Round 6's batch is the FINAL rotation: the 23 names never yet
# sampled across CORRECTNESS_r01..r05 (authoritative list recomputed
# by `tools/rotate_probes.py`; VERDICT r05 "What's missing" #1 lists
# the same 23). Once CORRECTNESS_r06 attests these, every one of the
# 267 registered queries carries an external driver verdict and this
# list RETIRES (deleted, per VERDICT r04 #8) — the contract file then
# exposes the plain sorted registry with no sampling-shaped aliases.
DRIVER_PROBES = [
    # final batch: the llm/maint/scan/ts/udf/win tail (all green in the
    # local 267-case exact-value oracle differential, rounds 3-5)
    "llm_boilerplate",
    "llm_bpe_pairs",
    "llm_chat_format",
    "llm_chunk",
    "llm_corpus_filter",
    "llm_corpus_mix",
    "llm_corpus_rebuild",
    "llm_decontaminate",
    "llm_dedup_url",
    "llm_doc_topk_terms",
    "llm_tokens",
    "maint_partition_overwrite",
    "maint_snapshot_expire",
    "maint_state_inspect",
    "scan_orc",
    "scan_partitioned",
    "scan_recursive_glob",
    "scan_schema_evolution",
    "ts_seasonality",
    "udf_arrow",
    "win_distribution",
    "win_ignore_nulls",
    "win_running_distinct",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_dedup_count"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, plus the
    round's early-sorting driver-probe aliases."""
    out = {f"a_chk_{n}": REGISTRY[n].spark for n in DRIVER_PROBES}
    out.update({name: q.spark for name, q in sorted(REGISTRY.items())})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    out = {
        f"a_chk_{n}": REGISTRY[n].oracle
        for n in DRIVER_PROBES
        if REGISTRY[n].oracle is not None
    }
    out.update(
        {
            name: q.oracle
            for name, q in sorted(REGISTRY.items())
            if q.oracle is not None
        }
    )
    return out
