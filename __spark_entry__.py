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
# #2). Round 2's batch: the 5 r01-red queries after their
# scalar-output fixes, every query whose implementation changed this
# round (serialization, blocking keys, resize, fill-forward grid), and
# the driver-unverified Part-B core (joins, windows, set ops,
# sort/topk, scans, UDFs, projections). `tools/rotate_probes.py`
# computes the next batch from accumulated CORRECTNESS files.
DRIVER_PROBES = [
    "agg_approx_percentile",
    "agg_collect",
    "agg_percentile_multi",
    "fn_array",
    "fn_cast",
    "llm_embed_quantize",
    "llm_inverted_index",
    "llm_minhash_sig",
    "llm_mm_decode",
    "ts_fill_forward",
    "join_broadcast",
    "join_inner_hash",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_theta",
    "join_interval",
    "join_fuzzy_blocked",
    "key_concat",
    "project_select",
    "project_nested",
    "project_envelope",
    "win_rank",
    "win_analytic",
    "win_frame_rows",
    "win_frame_range",
    "win_dedup_rank",
    "sort_global",
    "limit_n",
    "topk",
    "topk_per_group",
    "set_union_all",
    "set_union",
    "set_intersect",
    "set_except",
    "scan_parquet",
    "scan_json",
    "scan_csv",
    "sink_parquet",
    "llm_mm_resize",
    "llm_dedup_ngram",
    "udf_scalar",
    "udf_pandas",
    "udaf_pandas",
    "udtf_apply",
    "llm_dedup_embed",
    "k8s_envelope_multidim_count",
    "llm_dedup_exact",
    "llm_dedup_near",
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
