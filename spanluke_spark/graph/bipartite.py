"""Butterfly (bipartite 4-cycle) counting over two-mode web graphs —
host↔entity, page↔template, query↔url. The butterfly is the bipartite
analogue of the triangle: the smallest unit of cohesion, and the base
signal for bipartite clustering coefficients, spam-farm detection
(link farms are butterfly-dense), and tip/wing decomposition.

Exact counting via pair-wise co-neighborhood aggregation (the standard
formulation, cf. Sanei-Mehri, Sariyüce & Tirthapura, KDD 2018,
"Butterfly Counting in Bipartite Networks"): pivoting on one side,
every pivot node of degree d emits C(d,2) same-side pairs of its
neighbors; grouping pairs gives the co-degree c of each pair, and
butterflies(pair) = C(c,2). Total work is Σ C(d,2) over the pivot
side, so ``butterfly_stats`` probes both sides with two 1-row
aggregates and pivots on the cheaper one — the KDD-2018 side-selection
rule, done relationally. Both stages are equi-joins / hash aggregates
(AQE splits residual hot keys); there is no all-pairs stage. At crawl
scale, super-hubs (an entity mentioned by 10^7 hosts) still dominate
Σ C(d,2) — cap or drop them upstream (the same preprocessing every
published butterfly system applies) before exact counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["butterfly_stats", "butterfly_counts", "k_wing"]


def _edges(edges: DataFrame, left: str, right: str) -> DataFrame:
    """Distinct bipartite edge set as (l, r) — multiplicity ignored,
    the standard convention (a repeated edge is not four new cycles)."""
    return edges.select(F.col(left).alias("l"), F.col(right).alias("r")).distinct()


def _pair_codegrees(e: DataFrame, pivot: str, side: str) -> DataFrame:
    """Pairs of ``side``-nodes sharing a ``pivot``-neighbor, with their
    co-degree: (u, v, c) with u < v, c = |N(u) ∩ N(v)| >= 1."""
    e1 = e.select(F.col(pivot).alias("p"), F.col(side).alias("u"))
    e2 = e.select(F.col(pivot).alias("p"), F.col(side).alias("v"))
    return (
        e1.join(e2, "p")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def butterfly_stats(
    edges: DataFrame, left: str = "left", right: str = "right"
) -> DataFrame:
    """edges(left, right) -> one row (n_left, n_right, n_edges,
    n_butterflies). Pivots on whichever side makes Σ C(deg,2) smaller
    (two scalar probes — bounded driver action), so a skewed side is
    enumerated, not enumerated-over.
    """
    e = _edges(edges, left, right).localCheckpoint(eager=True)

    def _wedge_cost(col: str) -> int:
        row = (
            e.groupBy(col)
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .collect()[0]
        )
        return int(row["w"] or 0)

    # pivot on the side whose wedge emission is cheaper; ties -> right
    # (pairs of LEFT nodes), a fixed deterministic choice
    pivot, side = ("l", "r") if _wedge_cost("l") < _wedge_cost("r") else ("r", "l")
    pairs = _pair_codegrees(e, pivot=pivot, side=side)
    bf = pairs.agg(
        F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0.0)
        ).cast("long").alias("n_butterflies")
    )
    counts = e.agg(
        F.countDistinct("l").alias("n_left"),
        F.countDistinct("r").alias("n_right"),
        F.count(F.lit(1)).alias("n_edges"),
    )
    return counts.crossJoin(F.broadcast(bf))


def _edge_butterfly_support(e: DataFrame) -> DataFrame:
    """Distinct edges (l, r) -> (l, r, support): butterflies per EDGE.
    support(u, x) = Σ_{v ~ x, v != u} (codeg(u, v) - 1): choosing the
    second left node v among x's other neighbors leaves codeg(u,v) - 1
    choices of second right node (x itself is always common). Edges in
    no butterfly are omitted (support 0). One wedge-instance equi-join
    + one pair join + one hash aggregate — the same O(Σ C(deg,2)) wedge
    bound as counting."""
    pairs = _pair_codegrees(e, pivot="r", side="l").where(F.col("c") >= 2)
    wedges = (
        e.select(F.col("l").alias("u"), F.col("r").alias("x"))
        .join(e.select(F.col("l").alias("v"), F.col("r").alias("x")), "x")
        .where(F.col("u") != F.col("v"))
    )
    return (
        wedges.join(
            pairs,
            (pairs.u == F.least(wedges.u, wedges.v))
            & (pairs.v == F.greatest(wedges.u, wedges.v)),
        )
        .groupBy(wedges.u.alias("l"), F.col("x").alias("r"))
        .agg(F.sum(F.col("c") - 1).alias("support"))
    )


def k_wing(
    edges: DataFrame,
    k: int,
    left: str = "left",
    right: str = "right",
    max_rounds: int = 50,
) -> DataFrame:
    """k-wing (k-bitruss) membership: the maximal bipartite subgraph in
    which every EDGE lies in >= k butterflies (Zou 2016, "Bitruss
    Decomposition of Bipartite Graphs"; Wang et al., VLDB 2020) ->
    (l, r, support) over distinct edges, support measured on the final
    wing subgraph. The two-mode analogue of k_truss and the standard
    link-farm extractor on host↔entity / query↔url graphs, where
    triangles do not exist and butterfly cohesion is the unit instead.

    Like the truss, wing peeling is CONFLUENT (drop ALL under-supported
    edges simultaneously, recompute, repeat — same fixpoint as any
    sequential peel order), so the relational rounds terminate at the
    textbook answer; the round-closing count() doubles as the fixpoint
    probe, localCheckpoint truncates lineage per round, and power-law
    two-mode graphs shed leaf edges (support 0) in round 1.
    """
    if k < 1:
        raise ValueError(f"k-wing requires k >= 1, got {k}")
    e = _edges(edges, left, right).localCheckpoint(eager=True)
    n_prev = e.count()
    for _ in range(max_rounds):
        kept = (
            _edge_butterfly_support(e)
            .where(F.col("support") >= k)
            .select("l", "r")
            .localCheckpoint(eager=True)
        )
        n_now = kept.count()
        e = kept
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
    return _edge_butterfly_support(e).where(F.col("support") >= k)


def butterfly_counts(
    edges: DataFrame, left: str = "left", right: str = "right", side: str = "left"
) -> DataFrame:
    """edges(left, right) -> (node, butterflies): per-node butterfly
    membership counts for the chosen ``side`` (nodes in no butterfly are
    omitted). butterflies(u) = Σ_{v != u, same side} C(codeg(u, v), 2) —
    each (u, v) pair with co-degree c closes C(c,2) butterflies, and u
    sits in all of them. The pivot side is forced to the OPPOSITE side
    (per-node counts for side S require pairs of S-nodes).
    """
    e = _edges(edges, left, right)
    pivot, s = ("r", "l") if side == "left" else ("l", "r")
    pairs = _pair_codegrees(e, pivot=pivot, side=s).where(F.col("c") >= 2)
    per_pair = pairs.select(
        F.explode(F.array("u", "v")).alias("node"),
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("bf"),
    )
    return per_pair.groupBy("node").agg(F.sum("bf").alias("butterflies"))
