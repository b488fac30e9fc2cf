"""Structured Streaming pipelines (reference parity, SURVEY.md §2 B.9)."""

from event_stream_for_k8s_spark.streaming.dedup_pipeline import (
    dedup_within_ttl,
    run_reference_pipeline,
)

__all__ = ["dedup_within_ttl", "run_reference_pipeline"]
