"""Weisfeiler-Leman (1-WL) color refinement — the canonical graph
fingerprint (Weisfeiler & Leman 1968; Shervashidze et al. 2011 "WL graph
kernels"): iteratively re-color every node with a hash of (own color,
sorted multiset of neighbor colors). After r rounds, two nodes with equal
colors have isomorphic r-hop unfoldings — the workhorse for detecting
templated page-graph structures (boilerplate site sections, mirrored
link farms) and for KG-entity structural roles, at a cost of r joins.

Determinism: colors are md5 hex prefixes of a canonical string, so runs,
retries, and the SQL oracle agree bit-for-bit. Initial color = the
node's degree (the standard uncolored-graph seed).

Scale shape per round: one equi-join (neighbor color lookup) + one
groupBy with a SORTED neighbor-color list. The list is bounded by the
degree — on crawl graphs cap hubs upstream (graph/linkpred.py's
hub-capped neighbor relation) exactly as the WL-kernel literature does
for power-law graphs; a 10^7-degree hub would otherwise build a
10^7-element array in one aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wl_colors"]


def wl_colors(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, color): 1-WL colors after ``rounds`` refinements over the
    UNDIRECTED graph; color is a 16-hex-char stable id."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).where(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()

    colors = und.groupBy(F.col("a").alias("node")).agg(
        F.substring(F.md5(F.count("*").cast("string")), 1, 16).alias("color")
    )
    for _ in range(rounds):
        nbr = und.join(
            colors.withColumnRenamed("node", "b").withColumnRenamed(
                "color", "nbr_color"
            ),
            "b",
        ).select(F.col("a").alias("node"), "nbr_color")
        colors = (
            nbr.groupBy("node")
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("nbr_color")), ","
                ).alias("sig")
            )
            .join(colors, "node")
            .select(
                "node",
                F.substring(
                    F.md5(F.concat(F.col("color"), F.lit("|"), F.col("sig"))),
                    1,
                    16,
                ).alias("color"),
            )
        )
    return colors
