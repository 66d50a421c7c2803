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

__all__ = ["sssp"]


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
