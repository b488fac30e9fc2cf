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
# #2). Round 4's batch follows VERDICT r03 "Next round" #1's priority:
# everything added or changed in round 3b (graph_*, the five new ts_*,
# llm_kl_drift/ccnet_buckets, agg_hist_equi_depth, the two new
# maint_*), the asof-join family, sql_*, TPC-H Q13/Q15/Q17/Q19/Q22,
# the six NEW partsupp TPC-H queries landed this round, and a
# cross-family fill of the remaining never-probed (join variants,
# scan_*, maint_*, llm_* including the rows-only simhash, udtf_py,
# stream_cdc_upsert, win_time_range). The ~51 still unprobed after
# this batch are round 5's rotation. `tools/rotate_probes.py` computes
# candidate batches from accumulated CORRECTNESS files.
DRIVER_PROBES = [
    # round-3b additions (changed most recently -> highest risk)
    "graph_degree",
    "graph_jaccard",
    "graph_triangles",
    "ts_acf",
    "ts_cusum",
    "ts_downsample_m4",
    "ts_mad_anomaly",
    "ts_user_entropy",
    "llm_kl_drift",
    "llm_ccnet_buckets",
    "agg_hist_equi_depth",
    "maint_clustering_depth",
    "maint_prune_zonemap",
    # asof family + sql_*
    "join_asof_forward",
    "join_asof_nearest",
    "join_asof_tolerance",
    "sql_cte_subquery",
    "sql_lateral",
    # TPC-H: round-3 five + the six new partsupp queries
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q16_parts_supplier_relation",
    "tpch_q20_potential_promotion",
    "tpch_q21_waiting_suppliers",
    # cross-family fill of the never-probed + the new prom egress
    "prom_k8s_exposition",
    "join_bloom_membership",
    "join_bucketed",
    "join_cross",
    "join_range_binned",
    "join_skew_salted",
    "llm_bm25",
    "llm_corpus_pipeline",
    "llm_dedup_clusters",
    "llm_dedup_simhash",
    "llm_dedup_substring",
    "llm_knn_ivf_exact",
    "llm_winnow",
    "maint_retention_delete",
    "maint_sorted_layout",
    "sample_stratified",
    "scan_json_corrupt",
    "scan_xml",
    "stream_cdc_upsert",
    "udtf_py",
    "win_time_range",
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
