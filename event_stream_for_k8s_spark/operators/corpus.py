"""Corpus-assembly operators: budgeted head selection.

``token_budget_head`` is the selection step of budgeted corpus
assembly ("greedily keep the longest documents until the token budget
fills", ties broken by doc_id). The obvious formulation is a GLOBAL
running sum over (ntok DESC, doc_id) — a single-partition window that
serializes the corpus at 100 TB. This operator derives the exact same
set from the distinct-length histogram instead:

1. aggregate per distinct ``ntok``: how many docs, how many tokens;
2. a cumulative window over that tiny relation (|distinct lengths|
   rows — broadcast scale) finds the lengths that fit entirely and
   the single boundary length;
3. fully-included lengths join back broadcast; the boundary length
   admits ``floor(remaining / ntok)`` docs ranked by doc_id WITHIN
   that length — a keyed window.

Every wide op is keyed; nothing global touches per-doc rows. The
greedy-prefix equivalence (the histogram selection equals the
running-sum prefix) is property-tested against a pure-Python greedy
spec in tests/test_properties.py, including the boundary ties and
cum == budget edge cases.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def token_budget_head(tok: DataFrame, budget: int) -> DataFrame:
    """Select the greedy (ntok DESC, doc_id ASC) prefix of ``tok``
    whose cumulative ``ntok`` stays within ``budget``.

    ``tok``: DataFrame with columns ``doc_id`` (unique, orderable)
    and ``ntok`` (bigint > 0); any other columns pass through.
    Returns the selected rows with the input schema.

    CACHE LIFETIME: the per-doc length relation is persisted (three
    consumers — length histogram, full-bucket join, boundary join —
    must not re-evaluate the upstream corpus scan) and CANNOT be
    unpersisted here without forcing eager evaluation of the lazy
    result. The caller owns it: the persisted handle is attached to
    the returned DataFrame as ``result.cached_input`` — long-lived
    sessions invoking this repeatedly (e.g. hypothesis differentials)
    should call ``result.cached_input.unpersist()`` once the result
    is materialized (ADVICE r08). One-shot query sessions can ignore
    it; executor storage eviction is safe (MEMORY_AND_DISK recomputes).
    """
    # three consumers (length histogram, full-bucket join, boundary
    # join) read the per-doc length relation; persist it so the
    # upstream (often a full corpus scan) evaluates once
    tok = tok.persist(StorageLevel.MEMORY_AND_DISK)
    by_len = tok.groupBy("ntok").agg(F.sum("ntok").alias("toks"))
    wl = Window.orderBy(F.desc("ntok"))  # distinct-length domain: tiny
    by_len = by_len.select(
        "ntok",
        F.sum("toks").over(wl).alias("cum"),
        (F.sum("toks").over(wl) - F.col("toks")).alias("prev_cum"),
    )
    full = by_len.filter(F.col("cum") <= F.lit(budget)).select("ntok")
    boundary = by_len.filter(
        (F.col("cum") > F.lit(budget)) & (F.col("prev_cum") < F.lit(budget))
    ).select(
        "ntok",
        F.floor(
            (F.lit(budget) - F.col("prev_cum")) / F.col("ntok")
        ).alias("k"),
    )
    sel_full = tok.join(F.broadcast(full), "ntok").select(*tok.columns)
    wb = Window.partitionBy("ntok").orderBy("doc_id")
    sel_bound = (
        tok.join(F.broadcast(boundary), "ntok")
        .withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= F.col("k"))
        .select(*tok.columns)
    )
    out = sel_full.unionByName(sel_bound)
    out.cached_input = tok  # caller-owned cache handle (see docstring)
    return out
