"""Directed triangle patterns — cyclic (a->b->c->a) vs transitive
(a->b, b->c, a->c) closed-triple counts and their balance: the
hierarchy audit of a directed web/citation graph (transitive closure
dominates in hierarchies and citation DAGs; cycles flag link rings
and mutual-promotion farms). The directed complement of the
undirected triangle count (q65) and the dyad census (q309).

Semantics (pattern OCCURRENCE counts, not the exclusive 16-class
Holland-Leinhardt census): a cyclic triangle is counted ONCE via its
minimum-labeled rotation (a < b and a < c); a transitive pattern is
counted once per (source, middle, sink) triple a->b->c with the
shortcut a->c present — triples carrying extra (reciprocal) edges
match multiple patterns, by design. hierarchy_ppm =
transitive * 10^6 div (transitive + cyclic).

Distributed shape: one wedge self-join on the shared middle + one
semi-join against the edge set for the closing edge — the q65/q143
scale shape; a max-degree cap belongs upstream for hub-heavy graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["directed_triangles"]


def directed_triangles(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """directed edges -> one row: (n_edges, cyclic, transitive,
    hierarchy_ppm). Self-loops dropped; hierarchy_ppm NULL when no
    closed triple exists."""
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    ab = e.select(F.col("s").alias("a"), F.col("d").alias("b"))
    bc = e.select(F.col("s").alias("b"), F.col("d").alias("c"))
    wedges = ab.join(bc, "b").where(F.col("a") != F.col("c"))
    ca = e.select(F.col("s").alias("c"), F.col("d").alias("a"))
    cyc = (
        wedges.join(ca, ["c", "a"])
        .where((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count(F.lit(1)).cast("long").alias("cyclic"))
    )
    ac = e.select(F.col("s").alias("a"), F.col("d").alias("c"))
    tra = wedges.join(ac, ["a", "c"]).agg(
        F.count(F.lit(1)).cast("long").alias("transitive")
    )
    ne = e.agg(F.count(F.lit(1)).alias("n_edges"))
    out = ne.crossJoin(F.broadcast(cyc)).crossJoin(F.broadcast(tra))
    return out.select(
        "n_edges",
        "cyclic",
        "transitive",
        F.when(
            F.col("cyclic") + F.col("transitive") > 0,
            F.expr("transitive * 1000000 div (transitive + cyclic)"),
        ).alias("hierarchy_ppm"),
    )
