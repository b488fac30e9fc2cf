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
``dropDuplicates`` does not.
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
    und = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d")
    ).union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    endpoint_nodes = und.select(F.col("s").alias("node")).distinct()
    if nodes is not None:
        endpoint_nodes = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .union(endpoint_nodes)
            .distinct()
        )
    und = und.localCheckpoint(eager=True)
    labels = endpoint_nodes.select(
        "node", F.col("node").alias("cluster_id")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        msgs = und.join(labels, und["d"] == labels["node"]).select(
            F.col("s").alias("node"), "cluster_id"
        )
        new_labels = (
            labels.select("node", "cluster_id")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
