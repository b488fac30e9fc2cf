"""Text-analysis expressions for the training-data pipeline.

All pure Catalyst expressions (split / higher-order functions /
regexp) — no UDFs, so they vectorize in codegen and scale linearly
with no Python overhead. Each has an exact DuckDB twin for the oracle.

Hash arithmetic stays in int64 with a 31-radix polynomial mod 2^31-1:
exact on both engines, overflow-free (31 * (2^31) << 2^63).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 2_147_483_647  # 2^31 - 1

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(F.lower(c), F.lit(BPE_RE), 0)


def token_hash(tok: Column) -> Column:
    """Rolling 31-radix hash of a token's character codes (int64)."""
    codes = F.transform(
        F.sequence(F.lit(1), F.length(tok)),
        lambda i: F.ascii(F.substr(tok, i, F.lit(1))).cast("bigint"),
    )
    return F.aggregate(
        codes, F.lit(0).cast("bigint"), lambda acc, x: (acc * 31 + x) % MOD
    )


def fingerprint_minhash3(toks: Column) -> Column:
    """Document fingerprint: min over rolling 3-token-window hashes —
    a winnowing-style rolling-hash signature (k=3 shingles)."""
    h = F.transform(toks, token_hash)
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(h) - 3, F.lit(0))),
        lambda i: (
            (F.element_at(h, i + 1) * 31 + F.element_at(h, i + 2)) % MOD * 31
            + F.element_at(h, i + 3)
        )
        % MOD,
    )
    return F.array_min(windows)


def sql_token_hash(tok: str) -> str:
    return (
        f"list_reduce(list_prepend(cast(0 as bigint), "
        f"list_transform(range(1, length({tok}) + 1), "
        f"i -> cast(ascii({tok}[i:i]) as bigint))), "
        f"(a, b) -> (a * 31 + b) % {MOD})"
    )


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword / word-length features."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_tok = F.size(toks)
    n_punct = F.regexp_count(c, F.lit(r"[^\w\s]"))
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return {
        "n_chars": F.length(c),
        "n_tokens": n_tok,
        "punct_ratio": n_punct.cast("double") / F.length(c),
        "stopword_ratio": n_stop.cast("double") / n_tok,
        "avg_token_len": (F.length(c) - n_tok + 1).cast("double") / n_tok,
    }


def gram3_hashes(ht: Column) -> Column:
    """3-gram rolling hashes over an array of token hashes."""
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(ht) - 3, F.lit(0))),
        lambda i: (
            (F.element_at(ht, i + 1) * 31 + F.element_at(ht, i + 2))
            % MOD * 31
            + F.element_at(ht, i + 3)
        )
        % MOD,
    )


def winnow_select(h: Column, w: int = 4) -> Column:
    """Winnowing selection over a gram-hash array: for every sliding
    window of ``w`` hashes pick the RIGHTMOST minimum, returning the
    per-doc distinct array of (fp_pos, fp_hash) structs (1-based
    positions into ``h``). Guarantee (Schleimer et al., MOSS): every
    window of ``w`` consecutive grams contributes a fingerprint, so
    any shared run of ``w + 2`` tokens between two docs shares one.
    """

    def pick(j):
        s = F.slice(h, j + 1, w)
        m = F.array_min(s)
        rpos = F.array_position(F.reverse(s), m)
        # size(s), not w: the only short window is a doc with fewer
        # than w grams (then j = 0 and s is the whole array)
        return F.struct(
            (j + (F.size(s) + 1) - rpos).cast("bigint").alias("fp_pos"),
            m.alias("fp_hash"),
        )

    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(h) - w, F.lit(0))), pick
        )
    )
