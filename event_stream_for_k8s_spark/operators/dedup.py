"""Deduplication operators.

Reference semantics (SURVEY.md §2 A5/A6): the reference derives a
string key ``concat(uid, ':', resource_version)`` with missing parts
defaulting to ``""`` (cisco-open/event-stream-for-k8s
``src/types.rs:21-35``) and drops events whose key exists in committed
state (``src/tasks.rs:95-103``). The batch twins here reproduce that as
relational operators; the streaming twin lives in
``streaming.dedup_pipeline``.

Scale notes (100 TB): ``dedup_exact`` is a hash aggregation on the key
— one shuffle, map-side partial dedup for free, AQE handles skew.
``dedup_rank`` is a window — same single shuffle on the key but keeps a
deterministic "which row survives" contract, which the plain
``dropDuplicates`` does not. ``dedup_first_agg`` keeps dedup_rank's
deterministic contract but runs as a ``min_by`` HASH AGGREGATION:
map-side partial aggregation pre-collapses duplicates before the
shuffle (when key cardinality << row count the exchange carries
~|keys| rows per mapper instead of every row) and no per-partition
sort ever runs — the preferred form whenever downstream doesn't need
the non-surviving rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_key(cols: Sequence[Column | str], sep: str = ":") -> Column:
    """Reference A5 key: sep-joined parts, NULL parts -> '' (so two
    keyless rows collide — intended, see SURVEY.md §3.4.5)."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("")
        )
        for c in cols
    ]
    return F.concat_ws(sep, *parts)


def dedup_exact(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Reference A6 batch twin: keep one arbitrary row per key."""
    return df.dropDuplicates(list(keys))


def dedup_rank(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Deterministic dedup: first row per key under ``order``
    (win_dedup_rank — the oracle-checkable twin of A6)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_first_agg(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column | str],
) -> DataFrame:
    """Deterministic dedup as an AGGREGATION: the surviving row per
    key is the ``min_by`` under ``order`` — row-for-row equivalent to
    ``dedup_rank`` whenever ``order`` is total within each key (or
    order-ties carry identical payloads, e.g. exact re-deliveries).

    Scale: hash aggregate instead of sort+window — partial (map-side)
    combine collapses duplicates before the exchange, and nothing is
    ever sorted. Column order in the result is keys-first (select by
    name downstream, as everywhere else).
    """
    other = [c for c in df.columns if c not in set(keys)]
    ord_struct = F.struct(
        *[F.col(c) if isinstance(c, str) else c for c in order]
    )
    return (
        df.groupBy(*keys)
        .agg(F.min_by(F.struct(*other), ord_struct).alias("__first"))
        .select(*keys, "__first.*")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by iterative min-label propagation:
    ``(node, cluster_id)`` where cluster_id = min node id reachable.

    This is the step near-dup pipelines need AFTER pair generation —
    near-duplicate is not transitive, so keeping one doc per PAIR
    over-deletes; keeping one per COMPONENT is the standard contract.

    Each round every node adopts the min label in its neighborhood;
    rounds needed = graph diameter (near-dup components are shallow —
    a handful). Each round is one shuffle join + one shuffle agg, all
    JVM-side; ``localCheckpoint`` truncates the growing lineage so
    plan size stays O(1) per round. The driver-side loop only reads a
    scalar convergence count — data never leaves the executors. At
    extreme diameters switch to alternating large-star/small-star
    (Kiveris et al.), same primitive ops.
    """
    # Materialize the (possibly very expensive) edge plan exactly once
    # BEFORE fanning it out into the undirected union / node set /
    # label seed — otherwise the upstream pair-generator (an all-pairs
    # cosine join in the sf tests, an LSH band join at scale) re-runs
    # once per consumer.
    directed = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).localCheckpoint(eager=True)
    und = directed.union(
        directed.select(F.col("d").alias("s"), F.col("s").alias("d"))
    )
    endpoint_nodes = und.select(F.col("s").alias("node")).distinct()
    if nodes is not None:
        endpoint_nodes = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .union(endpoint_nodes)
            .distinct()
        )
    labels = endpoint_nodes.select(
        "node", F.col("node").alias("cluster_id")
    ).localCheckpoint(eager=True)
    # Labels are node ids and only ever DECREASE (min over a set that
    # includes the current label), so: (a) a pointer-jump — replace
    # each node's label by its label's label — is also monotone and
    # shortcuts long chains, turning O(diameter) rounds into
    # O(log diameter); (b) the global label sum strictly decreases
    # until the fixpoint, so convergence detection is one cheap
    # aggregate instead of a self-join diff.
    prev_sum = None
    for _ in range(max_iter):
        msgs = und.join(labels, und["d"] == labels["node"]).select(
            F.col("s").alias("node"), "cluster_id"
        )
        cand = (
            labels.select("node", "cluster_id")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
        )
        lut = cand.select(
            F.col("node").alias("_l"), F.col("cluster_id").alias("_ll")
        )
        labels = (
            cand.join(lut, cand["cluster_id"] == lut["_l"], "left")
            .select(
                "node",
                F.coalesce("_ll", "cluster_id").alias("cluster_id"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(F.sum("cluster_id")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels
