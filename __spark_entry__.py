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
# #2). Round 5's batch follows VERDICT r04 "Next round" #1's priority:
# the six round-5 additions (two scale-safe bucketing variants, four
# exactness anchors), the fifteen round-4 additions the r04 probe
# batch predated, then the llm_*/scan_* tail. The 23 still unprobed
# after this batch (llm/maint/scan/ts/udf/win tail; the authoritative
# list is `tools/rotate_probes.py` output) are
# round 6's final rotation, after which DRIVER_PROBES is retired
# (VERDICT r04 #8). `tools/rotate_probes.py` computes candidate
# batches from accumulated CORRECTNESS files.
DRIVER_PROBES = [
    # round-5 additions (changed this round -> highest risk): the two
    # scale-safe bucketing variants + the four exactness anchors
    "agg_approx_distinct_exact",
    "agg_approx_percentile_exact",
    "agg_hist_equi_depth_approx",
    "graph_pagerank_exact",
    "llm_ccnet_buckets_approx",
    "llm_dedup_simhash_exact",
    # round-4 additions never probed (VERDICT r04 "Next round" #1)
    "agg_hist_equi_width",
    "fn_array_setops",
    "join_null_safe",
    "llm_badwords_filter",
    "llm_bigram_lm",
    "llm_code_detect",
    "llm_semdedup",
    "scan_binaryfile",
    "scan_json_multiline",
    "scan_text",
    "set_except_all",
    "set_intersect_all",
    "sql_qualify",
    "ts_holt",
    "win_nth_value",
    # llm/scan tail fill (driver-unprobed; local oracle green)
    "agg_countmin",
    "llm_char_entropy",
    "llm_dedup_incremental",
    "llm_docstats",
    "llm_dsir_weights",
    "llm_embed_centroids",
    "llm_fingerprint",
    "llm_gopher_rules",
    "llm_knn_brute",
    "llm_knn_ivf",
    "llm_knn_lsh",
    "llm_knn_pq",
    "llm_langid",
    "llm_mix_temperature",
    "llm_mm_frames",
    "llm_multimodal",
    "llm_ngram_novelty",
    "llm_normalize",
    "llm_pack_sequences",
    "llm_perplexity",
    "llm_pii_redact",
    "llm_quality",
    "llm_repetition",
    "llm_shard_manifest",
    "llm_split",
    "llm_text_stats",
    "llm_text_tfidf",
    "llm_token_budget",
    "llm_tokenizer_coverage",
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
