"""Reusable relational operators (the engine's library surface)."""

from event_stream_for_k8s_spark.operators.dedup import (
    dedup_exact,
    dedup_first_agg,
    dedup_key,
    dedup_rank,
)
from event_stream_for_k8s_spark.operators.joins import asof_join
from event_stream_for_k8s_spark.operators.topk import top_k, top_k_per_group

__all__ = [
    "dedup_exact",
    "dedup_first_agg",
    "dedup_key",
    "dedup_rank",
    "asof_join",
    "top_k",
    "top_k_per_group",
]
