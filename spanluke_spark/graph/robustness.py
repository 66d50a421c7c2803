"""Hub-removal robustness curve — giant-component survival as the
top-degree hubs are deleted (Albert, Jeong & Barabasi 2000's attack
tolerance): the classic scale-free fragility audit for a crawl/link
graph ("how much of the web stays reachable if the k biggest hubs
ban the crawler?"). Composes the engine's alternating-star connected
components (canon/cc.py, the q26/q45 machinery) over successively
hub-pruned edge sets.

For each k in ks: drop the k highest-degree nodes (undirected degree,
ties by node id ascending — deterministic), run CC on the surviving
edges, report surviving node/edge counts, component count and the
giant component's size plus its exact share of ORIGINAL nodes
(trunc-ppm).

Distributed shape: degree = one groupBy; removal = two broadcast
anti-joins (k rows); CC is the production alternating-star operator;
the ks loop is a constant-length Python loop over a LITERAL list —
each iteration is a bounded Spark job chain, nothing driver-sized
beyond the k hub ids. Isolated nodes (all edges pruned) count as
size-1 components via the node universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["robustness_curve"]


def robustness_curve(
    edges: DataFrame,
    ks: list[int] = (0, 2, 5),
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """undirected-interpreted edges -> per k: (k_removed, n_nodes,
    n_edges, n_components, giant_size, giant_share_ppm) where
    giant_share_ppm is giant_size * 10^6 div ORIGINAL node count."""
    from ..canon.cc import connected_components

    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    nodes = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .distinct()
    )
    n_total = nodes.count()
    deg = (
        e.select(F.col("s").alias("n"))
        .unionByName(e.select(F.col("d").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("n").asc())
    )
    out = None
    for k in ks:
        hubs = deg.limit(k).select("n") if k else None
        ek = e
        nk = nodes
        if hubs is not None and k > 0:
            hb = F.broadcast(hubs)
            ek = e.join(
                hb.select(F.col("n").alias("s")), "s", "left_anti"
            ).join(hb.select(F.col("n").alias("d")), "d", "left_anti")
            nk = nodes.join(hb, "n", "left_anti")
        cc = connected_components(ek, src="s", dst="d")
        # isolated survivors (every incident edge pruned) are their own
        # components
        comp = nk.join(cc, nk["n"] == cc["node"], "left").select(
            nk["n"], F.coalesce(cc["component"], nk["n"]).alias("comp")
        )
        sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("sz"))
        row = sizes.agg(
            F.count(F.lit(1)).alias("n_components"),
            F.max("sz").cast("long").alias("giant_size"),
        ).select(
            F.lit(k).cast("int").alias("k_removed"),
            F.lit(nk.count()).cast("long").alias("n_nodes"),
            F.lit(ek.count()).cast("long").alias("n_edges"),
            F.coalesce(F.col("n_components"), F.lit(0))
            .cast("long")
            .alias("n_components"),
            F.coalesce(F.col("giant_size"), F.lit(0)).alias("giant_size"),
        )
        row = row.withColumn(
            "giant_share_ppm",
            F.expr(f"giant_size * 1000000 div {n_total}"),
        )
        out = row if out is None else out.unionByName(row)
    return out
