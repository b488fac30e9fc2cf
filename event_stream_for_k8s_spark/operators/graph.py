"""Iterative graph operators over edge DataFrames.

Companion to ``operators.dedup.connected_components``: the same
"driver-side loop over checkpointed DataFrames" harness, applied to
PageRank. At 100 TB the loop body is shuffle-partitioned by node id
and each iteration is one join + one aggregation; ``localCheckpoint``
truncates lineage so the plan stays O(1) per round. Only scalars
(the dangling-mass sum) ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    damping: float = 0.85,
    iters: int = 10,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """PageRank over a DIRECTED edge list; returns (node, rank).

    Rank mass is conserved exactly: dangling nodes (no out-edges —
    e.g. isolated docs in a similarity graph) redistribute their mass
    uniformly each round, so sum(rank) == 1 up to float noise — the
    invariant the tests assert. For an undirected graph pass both
    edge directions.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    all_nodes = nodes.select(
        F.col(nodes.columns[0]).alias("node")
    ).distinct()
    n = all_nodes.count()
    if n == 0:
        # an empty node set is a reachable serving state (every doc
        # filtered out upstream): empty contract-schema result, not a
        # driver-side 1.0/0 (tests/test_empty_inputs.py)
        return all_nodes.select("node", F.lit(0.0).alias("rank")).limit(0)
    ranks = all_nodes.select(
        "node", F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)
    # the dangling NODE SET is static (degrees don't change) — compute
    # it once; only its rank mass changes per round
    dangling_nodes = all_nodes.join(
        deg, all_nodes["node"] == deg["src"], "left_anti"
    ).localCheckpoint(eager=True)
    for it in range(iters):
        # mass flowing along edges
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
        )
        inflow = contribs.groupBy("node").agg(F.sum("c").alias("mass"))
        # dangling mass stays IN the plan as a broadcast scalar — no
        # per-round driver collect, one job per iteration
        dm = dangling_nodes.join(ranks, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
        )
        ranks = (
            all_nodes.join(inflow, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("dm") / n
                    + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
                ).alias("rank"),
            )
        )
        # Checkpoint every SECOND round, not every round: the eager
        # materialization job is the per-iteration fixed cost, and a
        # two-round lineage is still O(1) plan depth. Measured at
        # sf0.1: every-round 5.4-6.2 s, every-2 4.4-4.8 s, every-5
        # regresses (plan-compile blowup) — see SCALING.md.
        if it % 2 == 1 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def kcore_peel(
    und: DataFrame, k: int, rounds: int
) -> DataFrame:
    """Bounded k-core peeling over an undirected edge relation.

    ``und`` holds both directions of every edge as (src, dst). Each
    round drops every node whose degree among the still-alive nodes
    is < k; after ``rounds`` rounds the survivors with their final
    in-core degrees are returned as
    ``(v, core_deg, converged)`` — ``converged`` is TRUE iff the last
    round removed nobody, i.e. the bounded peel reached the true
    k-core fixed point (peeling is monotone, so once a round is
    empty every later round is too). A graph that needs more rounds
    reports converged = FALSE identically on any engine replaying
    the same unroll — bounded-iteration honesty, same contract as
    the pagerank anchor's fixed 3 rounds.

    Plan shape per round: two hash semi-joins (edge endpoints against
    the alive set) + one keyed count — all equi-joins on node ids,
    linear in |E| per round. Each alive relation is eagerly
    localCheckpointed: the next round references it twice (both
    endpoints), so un-checkpointed lineage would double per round.
    The loop early-exits on the per-round survivor COUNT (one driver
    scalar, the connected_components precedent): since each round's
    survivors are a subset of the previous alive set, equal counts
    mean set equality — the fixed point — so converged rounds are
    never re-executed and the result is identical to the full unroll
    (converged rounds are idempotent, which is what lets the
    fixed-round oracle replay an early-exited run).
    """
    if rounds < 1:
        raise ValueError(f"kcore_peel needs rounds >= 1, got {rounds}")
    und = und.localCheckpoint(eager=True)
    alive = (
        und.select(F.col("src").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_alive = alive.count()
    deg = None
    converged = False
    for _ in range(rounds):
        deg = (
            und.join(alive.withColumnRenamed("v", "src"), "src")
            .join(
                alive.select(F.col("v").alias("dst")), "dst"
            )
            .groupBy("src")
            .agg(F.count("*").cast("long").alias("core_deg"))
        )
        nxt = (
            deg.filter(F.col("core_deg") >= k)
            .select(F.col("src").alias("v"))
            .localCheckpoint(eager=True)
        )
        n_nxt = nxt.count()
        if n_nxt == n_alive:
            converged = True
            break
        alive, n_alive = nxt, n_nxt
    # survivor degrees were computed against the previous alive set;
    # at the fixed point that set equals the survivors, so core_deg
    # is the true in-core degree
    return (
        deg.filter(F.col("core_deg") >= k)
        .select(F.col("src").alias("v"), "core_deg")
        .withColumn("converged", F.lit(converged))
    )
