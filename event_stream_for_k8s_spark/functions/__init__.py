"""Column-expression libraries (JVM-side, codegen-friendly)."""

from event_stream_for_k8s_spark.functions.vectors import cosine, dot, l2norm
from event_stream_for_k8s_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint_minhash3,
    quality_features,
    token_hash,
    tokens,
)

__all__ = [
    "cosine",
    "dot",
    "l2norm",
    "tokens",
    "bpe_ish_tokens",
    "token_hash",
    "fingerprint_minhash3",
    "quality_features",
]
