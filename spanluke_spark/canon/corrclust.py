"""Correlation clustering (deterministic parallel pivot) for entity
canonicalization under CONFLICTING evidence.

Plain connected components (canon/cc.py) is the right collapse when every
match edge is trusted: it takes the transitive closure. But at crawl scale
the match graph carries noise — alias collisions ("Washington" the court
vs the judge), fuzzy-key accidents — and one bad edge chains two giant
entities together forever. Correlation clustering is the standard repair
(Bansal/Blum/Chawla 2004): cluster so that positive edges mostly stay
inside and absent/negative edges mostly stay outside; crucially it does
NOT transitively merge, so one bad edge costs one disagreement instead of
a catastrophic union.

This module implements the PIVOT algorithm (Ailon/Charikar/Newman 2008,
3-approximation in expectation under a random permutation) in its
parallel local-minimum form (the C4/ClusterWild family, Pan et al. 2015):

  round r: every still-unclustered node whose permutation priority beats
  every still-unclustered positive neighbor becomes a PIVOT (local minima
  form an independent set, so pivots never collide); every unclustered
  node adjacent to >= 1 pivot joins its minimum-priority adjacent pivot;
  clustered nodes leave the graph.

Clusters are therefore STARS around pivots — radius 1 in the positive
graph by construction (the pytest asserts it) — never closure chains.
The permutation is a deterministic hash of the node id (callers may
substitute any injective priority, e.g. the modulus permutation the
DuckDB oracle replays), so reruns and resumes agree bit-for-bit.

Scale shape: each round is two semi-joins (restrict edges to live
nodes), one min-aggregate per endpoint (map-side partial — hub-degree
safe, min is algebraic), and one anti-join; all keyed on node ids.
Rounds are O(log n) w.h.p. under a hash permutation (each round removes
every local-min star); per-round ``localCheckpoint`` keeps plans flat —
the repo-wide iterative discipline (canon/cc.py, graph/pagerank.py).
The fixpoint probe is ``limit(1).count()``, never a full count.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["pivot_clusters", "clustering_disagreements"]


def pivot_clusters(
    edges: DataFrame,
    rounds: int = 12,
    node_a: str = "a",
    node_b: str = "b",
    priority_fn: Callable[[Column], Column] | None = None,
    checkpoint: bool = True,
    probe: bool = True,
) -> DataFrame:
    """edges(a, b): positive-evidence pairs (either orientation; self
    loops and duplicates collapse) -> (node, cluster) with cluster = the
    pivot node id. Every edge-touched node is assigned within ``rounds``
    rounds or omitted (fixed round count keeps the job bounded and the
    unrolled oracle exact; ``probe`` short-circuits once all nodes are
    clustered). Isolated nodes never enter ``edges`` — union them back
    as singletons at the call site if needed.

    ``priority_fn`` maps the node column to an injective priority
    (default: the portable 60-bit md5 hash). Ties beyond the priority
    break on the node id itself, so any priority is safe, but an
    injective one makes the contract replayable in plain SQL.
    """
    pri = priority_fn or (lambda c: portable_hash64(c.cast("string")))
    e = edges.select(
        F.col(node_a).alias("u"), F.col(node_b).alias("v")
    ).filter(F.col("u") != F.col("v"))
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct()
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)

    active = sym.select("u").distinct().select(F.col("u").alias("node"))
    if checkpoint:
        active = active.localCheckpoint(eager=True)

    key = lambda c: F.struct(pri(c).alias("p"), c.alias("n"))  # noqa: E731
    assigned: DataFrame | None = None
    for _ in range(rounds):
        if probe and active.limit(1).count() == 0:
            break
        e_act = (
            sym.join(active.select(F.col("node").alias("u")), "u", "left_semi")
            .join(active.select(F.col("node").alias("v")), "v", "left_semi")
        )
        nbr_min = e_act.groupBy("u").agg(F.min(key(F.col("v"))).alias("_mn"))
        pivots = (
            active.join(nbr_min, active.node == nbr_min.u, "left")
            .filter(
                F.col("_mn").isNull() | (key(F.col("node")) < F.col("_mn"))
            )
            .select("node")
        )
        by_pivot = (
            e_act.join(
                pivots.select(F.col("node").alias("v")), "v", "left_semi"
            )
            .groupBy("u")
            .agg(F.min(key(F.col("v"))).alias("_c"))
            .select(F.col("u").alias("node"), F.col("_c.n").alias("cluster"))
            # a pivot is never adjacent to another pivot (local minima are
            # independent), but keep the invariant explicit and cheap:
            .join(pivots, "node", "left_anti")
        )
        asg = pivots.select(
            "node", F.col("node").alias("cluster")
        ).unionByName(by_pivot)
        if checkpoint:
            asg = asg.localCheckpoint(eager=True)
        assigned = asg if assigned is None else assigned.unionByName(asg)
        active = active.join(asg.select("node"), "node", "left_anti")
        if checkpoint:
            active = active.localCheckpoint(eager=True)
    if assigned is None:
        return active.select(
            "node", F.col("node").alias("cluster")
        ).limit(0)
    return assigned


def clustering_disagreements(
    pos_edges: DataFrame,
    neg_edges: DataFrame,
    clusters: DataFrame,
    node_a: str = "a",
    node_b: str = "b",
) -> DataFrame:
    """The correlation-clustering objective, exactly: one row
    (pos_cut, neg_inside, disagreements) counting positive pairs split
    across clusters plus negative pairs co-clustered. Both edge sets
    collapse to undirected distinct pairs first, so parallel/reversed
    duplicates count once. Two broadcast-free equi-joins on the node id
    per edge set — nothing scales beyond |E|.
    """
    canon = lambda df: (  # noqa: E731
        df.select(
            F.least(F.col(node_a), F.col(node_b)).alias("u"),
            F.greatest(F.col(node_a), F.col(node_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    cu = clusters.select(F.col("node").alias("u"), F.col("cluster").alias("cu"))
    cv = clusters.select(F.col("node").alias("v"), F.col("cluster").alias("cv"))

    def _labeled(df: DataFrame) -> DataFrame:
        return canon(df).join(cu, "u").join(cv, "v")

    pos = _labeled(pos_edges).agg(
        F.coalesce(
            F.sum((F.col("cu") != F.col("cv")).cast("long")), F.lit(0)
        ).alias("pos_cut")
    )
    neg = _labeled(neg_edges).agg(
        F.coalesce(
            F.sum((F.col("cu") == F.col("cv")).cast("long")), F.lit(0)
        ).alias("neg_inside")
    )
    return pos.crossJoin(F.broadcast(neg)).select(
        "pos_cut",
        "neg_inside",
        (F.col("pos_cut") + F.col("neg_inside")).alias("disagreements"),
    )
