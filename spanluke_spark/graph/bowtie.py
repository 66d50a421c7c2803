"""Web-graph bow-tie decomposition (Broder et al. 2000, "Graph structure
in the web") — the canonical macro-structure analysis of a crawl: a giant
strongly-connected CORE, an IN set that reaches it, an OUT set it reaches,
and everything else (tendrils, tubes, disconnected islands).

Method (Broder's own): pick a pivot in the giant SCC, run ONE forward and
ONE backward BFS. CORE = fwd ∩ bwd, IN = bwd − CORE, OUT = fwd − CORE,
OTHER = the rest. Two frontier-BFS passes (per-round cost proportional to
frontier-adjacent edges, graph/closure.hop_distance) and three hash joins —
this is the linear-work formulation that scales to a 10^12-edge crawl,
unlike materializing a transitive closure.

Pivot selection is deterministic: highest total degree, ties to the
smallest node id — on a web graph the max-degree node sits in the giant
SCC with overwhelming probability (and the caller can pass an explicit
pivot when it knows better). ``scc_of_pivot`` exposes the CORE alone for
callers that just want the giant SCC membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import hop_distance

__all__ = ["pick_pivot", "bowtie_decomposition", "scc_of_pivot"]


def pick_pivot(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """1-row (node): the max-total-degree node, ties to the smallest id.

    Degrees are two map-side-combinable aggs over the edge list; the
    1-row result is the only thing collected/broadcast downstream.
    """
    deg = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    return deg.orderBy(F.col("deg").desc(), F.col("node")).limit(1).select("node")


def bowtie_decomposition(
    edges: DataFrame,
    pivot: DataFrame | None = None,
    max_hops: int = 64,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, region) for every node in the edge list, region ∈
    {CORE, IN, OUT, OTHER}.

    OTHER collapses Broder's TENDRILS + TUBES + DISCONNECTED (separating
    those requires further BFS passes from IN/OUT; the 4-way split is the
    form used for crawl health dashboards). ``max_hops`` bounds each BFS;
    real web graphs have effective diameter ~16 (Broder measured ~6 in
    the core), so 64 is a safety net, not a tuning knob.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    if pivot is None:
        pivot = pick_pivot(e)
    seeds = pivot.select(F.col(pivot.columns[0]).alias("node"))

    fwd = hop_distance(e, seeds, max_hops=max_hops).select("node")
    bwd = hop_distance(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        seeds,
        max_hops=max_hops,
    ).select("node")

    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()

    region = (
        F.when(F.col("in_f") & F.col("in_b"), F.lit("CORE"))
        .when(F.col("in_b"), F.lit("IN"))
        .when(F.col("in_f"), F.lit("OUT"))
        .otherwise(F.lit("OTHER"))
    )
    return (
        nodes.join(fwd.withColumn("in_f", F.lit(True)), "node", "left")
        .join(bwd.withColumn("in_b", F.lit(True)), "node", "left")
        .fillna(False, ["in_f", "in_b"])
        .select("node", region.alias("region"))
    )


def scc_of_pivot(
    edges: DataFrame,
    pivot: DataFrame | None = None,
    max_hops: int = 64,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node): the strongly connected component containing the pivot
    (the giant SCC under the default max-degree pivot)."""
    return (
        bowtie_decomposition(edges, pivot=pivot, max_hops=max_hops, src=src, dst=dst)
        .filter(F.col("region") == "CORE")
        .select("node")
    )
