"""Neighborhood-function estimation over the web graph — the HyperBall
algorithm (Boldi & Vigna 2013, "In-Core Computation of Geometric
Centralities with HyperBall") with the engine's deterministic KMV sketch
in place of HyperLogLog: per node, estimate |{m : dist(n, m) <= r}| for
growing radii by iterating "my ball = merge of my out-neighbors' balls ∪
me". Reach curves feed effective-diameter estimates and harmonic/closeness
centrality at crawl scale, where an exact all-sources BFS is |V| BFS runs.

Why KMV instead of HLL: identical estimator quality class, but the sketch
content is a deterministic function of the node ids (portable md5), so the
SQL oracle reproduces every sketch row and the estimate EXACTLY — the
repo-wide no-RNG rule (see textops/sketch.py).

Relational shape per round: one equi-join of the sketch relation against
the edge list (neighbor rows re-keyed to the collecting node), one union
with the previous sketch, one per-node k-min (WindowGroupLimit partial
top-k — each task forwards <= k rows per node). Sketch size is k rows per
node, FIXED: a 10^7-degree hub's ball costs k rows, not 10^7. Rounds =
radius (web graphs: effective diameter ~6-16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64
from ..textops.sketch import M60

__all__ = ["kmv_ball", "exact_reach_curve"]


def kmv_ball(
    edges: DataFrame,
    radius: int = 2,
    k: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, n_kept, ball_estimate): estimated count of distinct nodes
    within <= radius directed hops of each node (self included; exact
    whenever the true ball is smaller than k)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sketch = nodes.select(
        "node", portable_hash64(F.col("node").cast("string")).alias("h")
    ).localCheckpoint(eager=True)

    w = Window.partitionBy("node").orderBy("h")
    for _ in range(radius):
        from_nbrs = e.join(
            sketch.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "h")
        sketch = (
            sketch.unionByName(from_nbrs)
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )

    return sketch.groupBy("node").agg(
        F.count("*").alias("n_kept"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                (k - 1) / (F.max("h") / F.lit(M60))
            ),
            6,
        ).alias("ball_estimate"),
    )


def ball_curve(
    edges: DataFrame,
    radius: int = 2,
    k: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, r, ball_estimate) for r = 0..radius: the per-node
    neighborhood function, one row per radius (r=0 is always 1.0)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    sketch = nodes.select(
        "node", portable_hash64(F.col("node").cast("string")).alias("h")
    ).localCheckpoint(eager=True)

    def estimate(s: DataFrame, r: int) -> DataFrame:
        return s.groupBy("node").agg(
            F.lit(r).alias("r"),
            F.round(
                F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                    (k - 1) / (F.max("h") / F.lit(M60))
                ),
                6,
            ).alias("ball_estimate"),
        )

    w = Window.partitionBy("node").orderBy("h")
    curves = [estimate(sketch, 0)]
    for r in range(1, radius + 1):
        from_nbrs = e.join(
            sketch.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "h")
        sketch = (
            sketch.unionByName(from_nbrs)
            .distinct()
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
            .localCheckpoint(eager=True)
        )
        curves.append(estimate(sketch, r))
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    return out


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 2,
    k: int = 16,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, harmonic): HyperBall's harmonic-centrality estimate
    HC(n) = sum over r of (|B_r| - |B_{r-1}|) / r, truncated at ``radius``
    (Boldi & Vigna 2013 §4 — the truncation is the standard approximation;
    contributions beyond the effective diameter are negligible). Note this
    counts nodes REACHABLE FROM n over out-edges; pass reversed edges for
    the in-reachability variant used for page importance."""
    curve = ball_curve(edges, radius=radius, k=k, src=src, dst=dst)
    w = Window.partitionBy("node").orderBy("r")
    return (
        curve.withColumn("prev", F.lag("ball_estimate").over(w))
        .where(F.col("r") > 0)
        .groupBy("node")
        .agg(
            F.round(
                F.sum((F.col("ball_estimate") - F.col("prev")) / F.col("r")), 6
            ).alias("harmonic")
        )
    )


def exact_reach_curve(
    edges: DataFrame,
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """EXACT neighbourhood function by bit-parallel BFS — the
    ground-truth counterpart of kmv_ball's sketch estimate (Palmer et
    al. 2002 ANF, with real bitsets instead of probabilistic counters):
    every node carries the bitset of nodes it can reach, one 64-bit
    word-slice per row, and per hop the reach relation absorbs the
    out-neighbors' bitsets with a bit_or aggregate. Returns the curve
    (hop, reachable_pairs) for hop 0..max_hops, where reachable_pairs =
    |{(u, v): dist(u, v) <= hop}| EXACTLY — the input to effective-
    diameter and distance-distribution reads that a sketch can only
    approximate.

    Scale contract, stated: bitset state is |V|/64 words per node, so
    this is Θ(|V|²/64) bits — the EXACT regime is for bounded node sets
    (host graphs, entity-cluster cores, validation slices that
    calibrate the kmv_ball estimator); the 10^12-page curve stays
    kmv_ball's job. Ids must be non-negative dense ints (the
    canonicalized-id domain); rows are sparse — absent (node, word)
    slices are implicit zeros, so early hops cost far less than the
    worst case.

    Relational shape per hop: one equi-join of the edge list against
    the reach relation (keyed on the edge head), one union, one
    map-side-combinable bit_or grouped by (node, word), one
    localCheckpoint; the per-hop count is a 1-row sum of bit_count.
    Deterministic: bit_or is order-free, no floats anywhere.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    reach = nodes.select(
        "node",
        F.expr("node DIV 64").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(node % 64 AS INT))").alias(
            "bits"
        ),
    ).localCheckpoint(eager=True)
    curve = []
    for hop in range(max_hops + 1):
        if hop > 0:
            contrib = e.join(
                reach.select(F.col("node").alias("dst"), "w", "bits"), "dst"
            ).select(F.col("src").alias("node"), "w", "bits")
            reach = (
                reach.unionByName(contrib)
                .groupBy("node", "w")
                .agg(F.expr("bit_or(bits)").alias("bits"))
                .localCheckpoint(eager=True)
            )
        n_pairs = reach.agg(
            F.sum(F.expr("bit_count(bits)")).alias("p")
        ).collect()[0]["p"]
        curve.append((hop, int(n_pairs)))
    spark = edges.sparkSession
    return spark.createDataFrame(curve, "hop int, reachable_pairs long")
