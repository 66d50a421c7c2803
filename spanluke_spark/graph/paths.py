"""Bounded single/multi-source shortest paths — relational Bellman-Ford.

The missing piece between reachability (graph/closure.py: CAN a fact
chain reach b?) and reach sketches (graph/neighborhood.py: HOW MANY
nodes within r hops?): the exact cheapest cost of getting there, over
weighted KG edges (citation hops, redirect chains with penalties,
crawl-frontier link distance from a trusted seed set).

Per round one equi-join of the current distance relation against the
edge list plus one min-aggregate — the textbook distributed Bellman-Ford
(the same shape Pregel/GraphX sssp lowers to), with per-round
localCheckpoint keeping the plan flat (the repo-wide iterative
discipline: canon/cc.py, graph/pagerank.py, graph/closure.py). After k
rounds the relation holds min path cost over paths of <= k edges —
exact SSSP once k >= the weighted-hop diameter, and a well-defined
deterministic quantity at ANY k (cycles included), which is what the
unrolled SQL oracle replays. Rounds are a fixed parameter, not a
fixpoint probe, so the job count is bounded and known up front; web
graphs sit at effective diameter ~6-16 (the HyperBall literature), so
k stays small where this engine runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sssp", "earliest_arrival"]


def sssp(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """edges(src, dst[, weight]) + sources(node) -> (node, dist): the
    cheapest path cost from ANY source over paths of at most ``rounds``
    edges; unreached nodes are omitted. ``weight`` None counts hops
    (every edge costs 1.0); negative weights are accepted (Bellman-Ford
    semantics — the bounded round count makes the result well defined
    even on a negative cycle, where an unbounded fixpoint would not be).
    Parallel edges collapse to their cheapest copy before iterating.
    ``checkpoint=False`` keeps the whole k-round plan lazy (no
    localCheckpoint) — right for small k and for end-to-end plan audits;
    the default truncates lineage per round, the iterative discipline
    every other fixpoint module here follows.
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w")
    ).groupBy("src", "dst").agg(F.min("w").alias("w"))
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    dist = (
        sources.select(F.col("node")).distinct().withColumn("dist", F.lit(0.0))
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist.node == e.src)
            .select(F.col("dst").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
        if checkpoint:
            dist = dist.localCheckpoint(eager=True)
    return dist


def earliest_arrival(
    edges: DataFrame,
    sources: DataFrame,
    rounds: int = 4,
    src: str = "src",
    dst: str = "dst",
    time: str = "t",
    start: float = 0.0,
    checkpoint: bool = True,
) -> DataFrame:
    """Time-respecting reachability: edges(src, dst, time) + sources(node)
    -> (node, arr), the earliest arrival time at each node over temporal
    paths whose edge times never decrease (Wu et al., VLDB 2014, "Path
    Problems in Temporal Graphs"; zero traversal duration). An edge
    (u, v, t) is usable only once you are AT u by time t (t >= arr(u)) —
    a crawl event, a citation, a recrawl observation cannot carry
    influence backwards in time, which plain reachability over the
    flattened edge set gets wrong.

    Sources arrive at ``start``; unreached nodes within ``rounds`` hops
    are omitted. Parallel edges at different times all stay live (an
    early copy may be unusable where a later one works), so the edge set
    is deduped, never weight-collapsed. Same relational shape and
    checkpoint discipline as ``sssp``: per round one equi-join (with the
    time predicate as a join residual) + one min aggregate.
    """
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(time).cast("double").alias("t"),
    ).distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    arr = (
        sources.select(F.col("node")).distinct()
        .withColumn("arr", F.lit(float(start)))
    )
    for _ in range(rounds):
        relaxed = (
            arr.join(e, (arr.node == e.src) & (e.t >= arr.arr))
            .select(F.col("dst").alias("node"), F.col("t").alias("arr"))
        )
        arr = (
            arr.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
        )
        if checkpoint:
            arr = arr.localCheckpoint(eager=True)
    return arr
