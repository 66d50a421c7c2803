"""Betweenness centrality — relational Brandes (Brandes 2001) with a
bounded BFS horizon: WHICH nodes do shortest paths flow THROUGH. The
centrality family here so far ranks by prestige (pagerank.py), incoming
authority (citations.py, links.py) or closeness (neighborhood.py's
harmonic centrality); betweenness finds the BROKERS — hub pages whose
removal disconnects communities, the canonical-entity nodes every
cross-domain path rides through. High-betweenness nodes in a match
graph are exactly the suspicious bridge entities correlation clustering
(canon/corrclust.py) exists to avoid merging through.

Brandes' two passes, lowered to joins:
  forward:  level-synchronous multi-source BFS carrying the shortest-
            path COUNT sigma — per level one equi-join frontier><edges,
            one anti-join against the visited set, one sum aggregate;
  backward: the dependency accumulation delta(u) = sum over successors
            v of sigma_u/sigma_v * (1 + delta_v), one level at a time
            from the horizon back to the sources (a driver loop over a
            BOUNDED, known level count — never a data-dependent scan).

The horizon (``max_depth``) makes the quantity "betweenness over
shortest paths of <= max_depth hops" — exact betweenness once max_depth
>= diameter, and a well-defined deterministic contract at ANY depth
(the same bounded-relaxation semantics as graph/paths.py sssp); web
graphs sit at effective diameter ~6-16. Exact all-sources Brandes is
O(|S| * reachable) state — quadratic; at crawl scale pass ``sources``
(the Bader/Brandes-pivot sampling estimator, scaled by n/|S|) instead
of defaulting to every node. Per-level ``localCheckpoint`` follows the
repo-wide iterative discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["betweenness", "katz_centrality"]


def betweenness(
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_depth: int = 4,
    src: str = "src",
    dst: str = "dst",
    undirected: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """edges(src, dst) -> (node, betweenness): Brandes dependency sums
    over shortest paths of <= max_depth hops from every source (default:
    every node — exact when max_depth >= diameter). Undirected graphs
    symmetrize and halve (each path counted once per direction). Nodes
    appearing in no (source, node != source) BFS pair are omitted —
    with symmetric edges that is only isolated nodes."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    if undirected:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()
    if checkpoint:
        e = e.localCheckpoint(eager=True)

    s = (
        sources.select(F.col("node"))
        if sources is not None
        else e.select(F.col("src").alias("node"))
    ).distinct()
    frontier = s.select(
        F.col("node").alias("source"),
        F.col("node").alias("node"),
        F.lit(0).alias("dist"),
        F.lit(1.0).alias("sigma"),
    )
    if checkpoint:
        frontier = frontier.localCheckpoint(eager=True)
    levels = [frontier]
    visited = frontier.select("source", "node")
    for lvl in range(1, max_depth + 1):
        nxt = (
            levels[-1]
            .join(e, levels[-1].node == e.src)
            .select("source", F.col("dst").alias("node"), "sigma")
            .join(visited, ["source", "node"], "left_anti")
            .groupBy("source", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .select("source", "node", F.lit(lvl).alias("dist"), "sigma")
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("source", "node"))
        if checkpoint:
            visited = visited.localCheckpoint(eager=True)

    deltas = [
        levels[-1].withColumn("delta", F.lit(0.0))
    ]
    for lvl in range(len(levels) - 2, -1, -1):
        succ = deltas[-1].select(
            "source",
            F.col("node").alias("_vn"),
            F.col("sigma").alias("_vsig"),
            F.col("delta").alias("_vdel"),
        )
        c = succ.join(e, succ._vn == e.dst).select(
            "source", F.col("src").alias("node"), "_vsig", "_vdel"
        )
        d = (
            levels[lvl]
            .join(c, ["source", "node"], "left")
            .groupBy("source", "node", "dist", "sigma")
            .agg(
                F.coalesce(
                    F.sum(
                        F.col("sigma") / F.col("_vsig") * (1 + F.col("_vdel"))
                    ),
                    F.lit(0.0),
                ).alias("delta")
            )
        )
        if checkpoint:
            d = d.localCheckpoint(eager=True)
        deltas.append(d)

    acc = deltas[0]
    for d in deltas[1:]:
        acc = acc.unionByName(d)
    half = F.lit(2.0) if undirected else F.lit(1.0)
    return (
        acc.filter(F.col("node") != F.col("source"))
        .groupBy("node")
        .agg(F.round(F.sum("delta") / half, 6).alias("betweenness"))
    )


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.5,
    beta: float = 1.0,
    rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Katz centrality (Katz 1953) after ``rounds`` fixed iterations of
    x <- beta + alpha * A^T x from x = beta — the attenuated-walk-count
    prestige measure that credits a node for ALL incoming walks, not
    just direct links (PageRank divides a voter's influence across its
    out-links; Katz does not, so it ranks broadly-cited-by-hubs pages
    differently). -> (node, katz).

    Per round: one equi-join of the score relation onto the edge list +
    one map-side-combinable sum by target + a left join back onto the
    node universe (nodes with no in-edges stay at beta); lineage
    truncated per round. Fixed-round form — no convergence test, so no
    spectral-radius constraint is needed for termination (for the
    infinite-sum interpretation alpha must be < 1/lambda_max, which the
    caller owns).

    Reproducibility: with a DYADIC alpha (0.5, 0.25, ...) and integer
    beta every score is an exact dyadic rational with denominator
    <= 2^(rounds), so all cross-row sums are exact in ANY aggregation
    order — the oracle replays bit-identically. Non-dyadic alphas work
    but lose that guarantee.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).where(
        F.col("src") != F.col("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    x = nodes.select("node", F.lit(float(beta)).alias("katz"))
    for _ in range(rounds):
        contrib = (
            e.join(x.select(F.col("node").alias("src"), "katz"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("katz").alias("_in"))
        )
        x = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("katz"),
            )
            .localCheckpoint(eager=True)
        )
    return x
