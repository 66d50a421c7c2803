"""Bounded hitting probability of an absorbing random walk — "what is
the chance a uniform random surfer starting at u lands in the flagged
set within k clicks?" — the ABSORPTION member of the walk family
(pagerank.py = stationary share, paths.py = shortest distance,
walks.py = sampled trajectories): spam-neighborhood scoring, paywall
leak estimation, crawl-trap proximity.

Value iteration on the absorbing chain (targets absorb with
probability 1; dangling pages absorb into "never reaches"):

    p_0(u)  = 1[u in targets]
    p_t(u)  = p_{t-1} over out-neighbors, averaged   (u not target)

Integer-quantized replay convention: probabilities are carried as
parts-per-million BIGINTs; each round is an exact integer SUM over
out-neighbors followed by ONE floor division by the out-degree — both
engines replay the recurrence bit-for-bit, no float accumulation
anywhere (the floor bias is < rounds ppm, stated in the contract;
the numpy parity pytest bounds it). int64 headroom: sum <= scale * n,
fine to ~10^12 nodes at ppm scale.

Scale shape: state is one row per node; each round is one equi-join of
the edge list against the state on dst (shuffle keyed by node id), one
map-side-combinable sum, one broadcast-free join back to out-degrees,
all flattened by a per-round localCheckpoint. Rounds are a fixed small
k (the product question is "within k clicks"), so the job count is
bounded by contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hitting_probability"]


def hitting_probability(
    edges: DataFrame,
    targets: DataFrame,
    rounds: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """edges(src, dst) directed + targets(node) -> (node, p_ppm):
    ppm-quantized probability that the walk from node is absorbed by
    the target set within ``rounds`` steps. Targets report exactly
    ``scale``; dangling non-targets report 0."""
    e = edges.select("src", "dst").distinct().localCheckpoint(eager=True)
    t = targets.select("node").distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(t)
        .distinct()
    )
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = (
        nodes.join(t.withColumn("_t", F.lit(1)), "node", "left")
        .join(outdeg.withColumnRenamed("src", "node"), "node", "left")
        .select(
            "node",
            F.coalesce("_t", F.lit(0)).alias("is_target"),
            F.coalesce("deg", F.lit(0)).alias("deg"),
        )
        .localCheckpoint(eager=True)
    )
    state = base.select(
        "node", (F.col("is_target") * scale).cast("long").alias("p")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        inflow = (
            e.join(state.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("p").alias("s"))
            .withColumnRenamed("src", "node")
        )
        state = (
            base.join(inflow, "node", "left")
            .select(
                "node",
                F.when(F.col("is_target") == 1, F.lit(scale).cast("long"))
                .when(
                    F.col("deg") > 0,
                    # exact int64 division (non-negative) == DuckDB //
                    F.expr("coalesce(s, 0L) div deg"),
                )
                .otherwise(F.lit(0).cast("long"))
                .alias("p"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select("node", F.col("p").alias("p_ppm"))
