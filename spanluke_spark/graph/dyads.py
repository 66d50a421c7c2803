"""Dyad census + reciprocity (Holland & Leinhardt 1970's M-A-N
counts): mutual / asymmetric / null dyad totals and the reciprocated-
edge fraction of a directed graph — the first-order structural audit
of a web/citation graph (link farms reciprocate heavily, organic
citation graphs barely; hreflang reciprocity q197 is the protocol-
specific instance, this is the generic graph statistic).

  M = dyads linked both ways, A = linked one way,
  N = C(n, 2) - M - A,
  reciprocity = 2M / (2M + A)  (fraction of directed edges whose
                                reverse also exists)

All exact integers (reciprocity as trunc-ppm with the exact 2M and
2M+A carried). Distributed shape: one distinct on edges, one groupBy
on the canonical unordered pair (least, greatest) counting directions
— combinable, corpus-linear, no pair enumeration beyond existing
edges (N is arithmetic, not materialized). Self-loops are dropped
(they belong to no dyad).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dyad_census"]


def dyad_census(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """directed edges -> one row: (n_nodes, n_edges, mutual, asym,
    null_dyads, reciprocity_ppm). reciprocity is NULL on an empty
    graph."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    pairs = e.select(
        F.least("s", "d").alias("a"),
        F.greatest("s", "d").alias("b"),
    ).groupBy("a", "b").agg(F.count(F.lit(1)).alias("dirs"))
    counts = pairs.agg(
        F.sum(F.when(F.col("dirs") == 2, 1).otherwise(0))
        .cast("long")
        .alias("mutual"),
        F.sum(F.when(F.col("dirs") == 1, 1).otherwise(0))
        .cast("long")
        .alias("asym"),
    )
    nodes = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    out = counts.crossJoin(F.broadcast(nodes)).crossJoin(
        F.broadcast(n_edges)
    )
    return out.select(
        "n_nodes",
        "n_edges",
        "mutual",
        "asym",
        (
            F.col("n_nodes") * (F.col("n_nodes") - 1) / 2
            - F.col("mutual")
            - F.col("asym")
        ).cast("long").alias("null_dyads"),
        F.when(
            2 * F.col("mutual") + F.col("asym") > 0,
            F.expr("2 * mutual * 1000000 div (2 * mutual + asym)"),
        ).alias("reciprocity_ppm"),
    )
