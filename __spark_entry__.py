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
# #2). Round 3's batch follows VERDICT r02 "Next round" #1's family
# priority: the whole streaming family (stream_* + source_*/sink_*,
# the reference-parity core), all TPC-H, all remaining ts_*, the
# highest-risk maint_*, plus a RE-probe of llm_dedup_ngram whose
# semantics changed this round (oversized-block cap). The remaining
# ~58 (rest of maint_*, llm_*, sql_*, scan_*, join variants, udtf_py)
# are round 4's batch. `tools/rotate_probes.py` computes batches from
# accumulated CORRECTNESS files and bumps queries whose module changed
# after the newest CORRECTNESS file landed.
DRIVER_PROBES = [
    "stream_dedup_ttl",
    "stream_foreach_metrics",
    "stream_full_outer_join",
    "stream_late_drop",
    "stream_outer_join",
    "stream_right_outer_join",
    "stream_session",
    "stream_sliding",
    "stream_stateful_custom",
    "stream_static_join",
    "stream_stream_join",
    "stream_topk",
    "stream_tumbling",
    "stream_watermark",
    "source_k8s_watch",
    "source_rate",
    "source_stream_file",
    "sink_console_json",
    "sink_memory",
    "sink_python_ds",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q10_returned_items",
    "tpch_q12_shipmode_priority",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_volume_customer",
    "ts_active_users",
    "ts_anomaly",
    "ts_cumulative_users",
    "ts_ewma",
    "ts_funnel",
    "ts_gapfill",
    "ts_histogram",
    "ts_interp_linear",
    "ts_ohlc",
    "ts_retention",
    "ts_streaks",
    "maint_compact",
    "maint_incremental",
    "maint_manifest_diff",
    "maint_merge_upsert",
    "maint_scd2",
    "maint_stats_collect",
    "maint_zorder",
    "llm_dedup_ngram",
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
