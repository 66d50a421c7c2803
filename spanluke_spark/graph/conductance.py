"""Per-community conductance (Kannan, Vempala & Vetta 2004) — the
standard cut-quality score for a partition of the page/host graph:
phi(S) = cut(S) / min(vol(S), vol(V \\ S)). The external-sparsity
companion to modularity (Louvain, q270), mixing patterns
(assortativity) and the robustness curve (q312): a community with
high modularity can still leak — conductance says how much of its
edge volume crosses the boundary.

All-integer: cut(S) counts boundary edges, vol(S) counts edge
ENDPOINTS in S (sum of degrees, so vol(V) = 2m exactly), and
phi_ppm = cut * 10^6 div min(vol, 2m - vol) is one truncating
division on non-negative integers (Spark div == DuckDB //). A
community holding ALL volume (min = 0, e.g. a single-community
labelling) surfaces NULL; an isolated community (no boundary edges)
scores exactly 0; one side of a complete bipartite graph scores
exactly 10^6 — all three gated in pytest.

Distributed shape: two hash joins attach labels to the edge
endpoints (broadcast when the node table is dimension-sized), then
ONE groupBy over the union of endpoint contributions — no window, no
self-join; linear in edges. Self-loops are dropped (they have no cut
semantics and would double-count volume asymmetrically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["conductance"]


def conductance(
    edges: DataFrame,
    nodes: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    id_col: str = "id",
    label_col: str = "community",
    broadcast_nodes: bool = True,
) -> DataFrame:
    """edges (u, v) undirected + nodes (id, community) -> per
    community: (community, vol, cut, phi_ppm)."""
    lab = nodes.select(
        F.col(id_col).alias("_nid"), F.col(label_col).alias("_lab")
    )
    lb = F.broadcast(lab) if broadcast_nodes else lab
    e = (
        edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
        .where(F.col(u_col) != F.col(v_col))
        .join(lb.withColumnRenamed("_lab", "lu"), F.col("u") == F.col("_nid"))
        .drop("_nid")
        .join(lb.withColumnRenamed("_lab", "lv"), F.col("v") == F.col("_nid"))
        .drop("_nid")
    )
    # each edge contributes one endpoint-row per side: volume counts
    # endpoints, cut counts boundary edges (once per side, so the cut
    # column is per-community already — no halving needed)
    sides = e.select(
        F.col("lu").alias("community"),
        (F.col("lu") != F.col("lv")).cast("long").alias("is_cut"),
    ).unionAll(
        e.select(
            F.col("lv").alias("community"),
            (F.col("lu") != F.col("lv")).cast("long").alias("is_cut"),
        )
    )
    per = sides.groupBy("community").agg(
        F.count(F.lit(1)).cast("long").alias("vol"),
        F.sum("is_cut").alias("cut"),
    )
    tot = per.groupBy().agg(F.sum("vol").alias("m2"))
    x = per.crossJoin(F.broadcast(tot))
    denom = F.least(F.col("vol"), F.col("m2") - F.col("vol"))
    return x.select(
        "community",
        "vol",
        "cut",
        F.when(
            denom > 0, F.expr("cut * 1000000 div least(vol, m2 - vol)")
        ).alias("phi_ppm"),
    )
