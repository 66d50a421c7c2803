"""Node-role cartography (Guimerà & Amaral 2005) and the
average-neighbor-degree spectrum (Pastor-Satarras et al. 2001) —
given a community partition of the link graph (Louvain q270, label
propagation q66), WHICH nodes hold it together? The per-node
refinement of the scalar mixing diagnostics: assortativity (q107)
says one number, knn(k) shows the whole degree-correlation curve,
and the (z, P) plane names each node's role.

Participation coefficient, exact: with per-node degree k_i and
per-community degree splits k_is,

  p_ppm = 10^6 * (k_i^2 - sum_s k_is^2) div k_i^2

ONE division per node (not a sum of truncations). P == 0 exactly
when all edges stay in one community; P -> (1 - 1/m) for an even
m-way split (pytest-pinned exactly for even splits).

Within-module degree z-score, sqrt-free (the q354 discipline): with
own-community internal degree x_i and that community's population
moments (n_s, S_s, Q_s),

  z2_milli = sign(n_s*x_i - S_s) * 1000 * (n_s*x_i - S_s)^2
             div (n_s*Q_s - S_s^2)

(|z| = sqrt(|z2|/1000); population variance, the G-A convention).
A single-node or degree-constant community surfaces NULL z2 and the
role falls back to the P bands alone.

Role taxonomy (G-A Fig. 2 thresholds, quantized once, stated):
hub iff z >= 2.5 (z2_milli >= 6250 and positive dev); non-hub P
bands 0.05 / 0.625 / 0.80 -> ultra-peripheral, peripheral,
connector, kinless; hub P bands 0.30 / 0.75 -> provincial_hub,
connector_hub, kinless_hub.

knn spectrum, exact: per degree class k, the average degree of
neighbors of k-degree nodes as one rational

  knn_milli = 1000 * sum(neighbor degrees) div (k * n_k)

— a falling curve is disassortative (hubs touch leaves), matching
the sign of q107 on the same graph (pytest-gated).

Distributed shape: degrees from one groupBy over the symmetrized
edge list; community decoration via (broadcastable) dimension joins;
every panel is one further groupBy. Linear in edges throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["node_roles", "avg_neighbor_degree"]


def _sym(edges: DataFrame, src: str, dst: str) -> DataFrame:
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).where(F.col(src) != F.col(dst))
    return e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def node_roles(
    edges: DataFrame,
    nodes: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "node",
    community_col: str = "community",
    broadcast_nodes: bool = True,
) -> DataFrame:
    """undirected edges (src, dst) + nodes (node, community) -> one
    row per node (node, community, degree, internal_degree, p_ppm,
    z2_milli, role)."""
    dim = nodes.select(
        F.col(id_col).alias("_nid"), F.col(community_col).alias("_c")
    )
    d = F.broadcast(dim) if broadcast_nodes else dim
    sym = (
        _sym(edges, src_col, dst_col)
        .join(d.withColumnRenamed("_c", "cu"), F.col("u") == F.col("_nid"))
        .drop("_nid")
        .join(d.withColumnRenamed("_c", "cv"), F.col("v") == F.col("_nid"))
        .drop("_nid")
    )
    per_comm_deg = sym.groupBy("u", "cu", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("kis")
    )
    per_node = per_comm_deg.groupBy("u", "cu").agg(
        F.sum("kis").alias("k"),
        F.sum(F.col("kis") * F.col("kis")).alias("k2sum"),
        F.sum(
            F.when(F.col("cv") == F.col("cu"), F.col("kis")).otherwise(
                0
            )
        ).alias("kin"),
    )
    comm_moments = per_node.groupBy("cu").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("kin").alias("ssum"),
        F.sum(F.col("kin") * F.col("kin")).alias("qsum"),
    )
    base = per_node.join(F.broadcast(comm_moments), "cu").select(
        F.col("u").alias("node"),
        F.col("cu").alias("community"),
        F.col("k").alias("degree"),
        F.col("kin").alias("internal_degree"),
        F.expr("(k * k - k2sum) * 1000000 div (k * k)").alias("p_ppm"),
        (F.col("ns") * F.col("kin") - F.col("ssum")).alias("dev"),
        (
            F.col("ns") * F.col("qsum") - F.col("ssum") * F.col("ssum")
        ).alias("svar"),
    )
    z2mag = F.expr("1000 * dev * dev div svar")
    z2 = F.when(
        F.col("svar") > 0,
        F.when(F.col("dev") < 0, -z2mag).otherwise(z2mag),
    )
    p = F.col("p_ppm")
    role = F.when(
        F.coalesce(F.col("z2_milli"), F.lit(0)) >= 6250,
        F.when(p < 300_000, F.lit("provincial_hub"))
        .when(p < 750_000, F.lit("connector_hub"))
        .otherwise(F.lit("kinless_hub")),
    ).otherwise(
        F.when(p < 50_000, F.lit("ultra_peripheral"))
        .when(p < 625_000, F.lit("peripheral"))
        .when(p < 800_000, F.lit("connector"))
        .otherwise(F.lit("kinless"))
    )
    return base.select(
        "node",
        "community",
        "degree",
        "internal_degree",
        "p_ppm",
        z2.alias("z2_milli"),
    ).select("*", role.alias("role"))


def avg_neighbor_degree(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """undirected edges -> one row per degree class (k, n_nodes,
    knn_milli): exact mean neighbor degree of k-degree nodes."""
    sym = _sym(edges, src_col, dst_col)
    deg = sym.groupBy("u").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    nbr = (
        sym.join(
            deg.select(
                F.col("u").alias("v"), F.col("k").alias("kv")
            ),
            "v",
        )
        .join(deg, "u")
        .groupBy("u", "k")
        .agg(F.sum("kv").alias("nbr_deg_sum"))
    )
    return (
        nbr.groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("nbr_deg_sum").alias("tot"),
        )
        .select(
            "k",
            "n_nodes",
            F.expr("1000 * tot div (k * n_nodes)").alias("knn_milli"),
        )
    )
