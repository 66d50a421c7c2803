"""Spatial/graph autocorrelation: Moran's I, Geary's C, and binary
join-count statistics (Moran 1950; Geary 1954; Cliff & Ord 1981) over
an adjacency list — "is a page's quality score correlated with its
neighbours' scores along the link graph?" is exactly the question a
100 TB crawl asks before trusting host-level propagation heuristics
(TrustRank q93, homophily q254 for categorical labels; this is the
NUMERIC-attribute counterpart).

Each listed edge (src, dst) is a weight-1 pair w_ij = 1; W counts the
listed pairs (callers pass a symmetrized list when they want the
textbook symmetric-W convention — the estimators are well defined
either way and the pytest replays both).

All-integer exactness (the q311/q354 sqrt-free discipline). With
integer attribute x, n nodes, Sx = sum x, Sxx = sum x^2 and the
n-scaled centering z~_i = n*x_i - Sx (so z~ = n*z exactly, no
division):

  I = (n / W) * sum_ij w_ij z_i z_j / sum_i z_i^2
    = sum_edges z~_s * z~_d  div  (W * (n*Sxx - Sx^2))        [x n]
  (the n^2 scalings cancel: sum z~^2 = n*(n*Sxx - Sx^2))

  C = ((n-1) / 2W) * sum_ij w_ij (x_i - x_j)^2 / sum_i z_i^2
    = n*(n-1)*D div (2*W*(n*Sxx - Sx^2)),  D = sum_edges (x_s-x_d)^2

Both are exact integer rationals before ONE sign-split truncating
division each (moran_ppm, geary_milli); Spark `div` == DuckDB `//`
after the sign split. Constant attribute (n*Sxx == Sx^2) or an empty
edge list surfaces NULL, never a divide-by-zero. The null expectation
E[I] = -1/(n-1) ships as expected_i_ppm with the same sign-split
trunc. Long-bound contract: 10^6 * |cross_num| needs
n * max|x|^2 * W <= ~9e12 — the callers use bounded slices
(n <= ~10^3, |x| <= ~10^3), the q330 contract.

Join counts (binary attribute b in {0,1}): BB / WW / BW observed edge
counts plus the free-sampling (nonfree, without-replacement)
expectations E[BB] = W * nb*(nb-1) / (n*(n-1)) etc., each one exact
cross product and one trunc to ppm of W (expected_*_ppm are
expectations scaled by 10^6 / W — i.e. expected edge FRACTIONS).

Distributed shape: one (broadcastable) dimension join decorates each
edge endpoint with its attribute, then ONE aggregate; the node-moment
aggregate is a second 1-row agg crossJoined in (the tfidf.py:38
pattern). Linear in edges, no window, no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["moran_geary", "join_counts"]


def _decorated_edges(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str,
    x_col: str,
    src_col: str,
    dst_col: str,
    broadcast_nodes: bool,
) -> DataFrame:
    """Attach the node attribute to both endpoints; drop self-loops
    (they carry no autocorrelation information and would bias W)."""
    dim = nodes.select(
        F.col(id_col).alias("_nid"), F.col(x_col).cast("long").alias("_x")
    )
    d = F.broadcast(dim) if broadcast_nodes else dim
    return (
        edges.select(
            F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
        )
        .where(F.col(src_col) != F.col(dst_col))
        .join(d.withColumnRenamed("_x", "xs"), F.col("_s") == F.col("_nid"))
        .drop("_nid")
        .join(d.withColumnRenamed("_x", "xd"), F.col("_d") == F.col("_nid"))
        .drop("_nid")
    )


def moran_geary(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    x_col: str = "x",
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_nodes: bool = True,
) -> DataFrame:
    """nodes (node, x int) + edges (src, dst) -> ONE row
    (n_nodes, w_edges, cross_num, geary_d, moran_ppm, expected_i_ppm,
    geary_milli): exact-rational Moran's I and Geary's C, each one
    sign-split trunc; NULL I/C on constant attribute or empty W."""
    moments = nodes.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(x_col).cast("long")).alias("sx"),
        F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long")).alias(
            "sxx"
        ),
    )
    e = _decorated_edges(
        nodes, edges, id_col, x_col, src_col, dst_col, broadcast_nodes
    )
    # n-scaled centered cross product needs n and sx per edge row: the
    # 1-row moment agg broadcasts into the edge agg via crossJoin.
    ed = e.crossJoin(F.broadcast(moments))
    eagg = ed.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum(
            (F.col("n") * F.col("xs") - F.col("sx"))
            * (F.col("n") * F.col("xd") - F.col("sx"))
        ).alias("cross_num"),
        F.sum(
            (F.col("xs") - F.col("xd")) * (F.col("xs") - F.col("xd"))
        ).alias("geary_d"),
    )
    base = moments.crossJoin(F.broadcast(eagg)).select(
        F.col("n"),
        F.col("w"),
        F.coalesce(F.col("cross_num"), F.lit(0).cast("long")).alias(
            "cross_num"
        ),
        F.coalesce(F.col("geary_d"), F.lit(0).cast("long")).alias(
            "geary_d"
        ),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "szz"
        ),
    )
    ok = (F.col("w") > 0) & (F.col("szz") > 0)
    mag_i = F.expr("abs(cross_num) * 1000000 div (w * szz)")
    return base.select(
        F.col("n").alias("n_nodes"),
        F.col("w").alias("w_edges"),
        F.col("cross_num"),
        F.col("geary_d"),
        F.when(
            ok, F.when(F.col("cross_num") < 0, -mag_i).otherwise(mag_i)
        ).alias("moran_ppm"),
        F.when(
            F.col("n") > 1, -F.expr("1000000 div (n - 1)")
        ).alias("expected_i_ppm"),
        F.when(
            ok,
            F.expr("n * (n - 1) * geary_d * 1000 div (2 * w * szz)"),
        ).alias("geary_milli"),
    )


def join_counts(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "node",
    b_col: str = "b",
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_nodes: bool = True,
) -> DataFrame:
    """nodes (node, b in {0,1}) + edges (src, dst) -> ONE row
    (n_nodes, n_black, w_edges, bb, ww, bw, expected_bb_ppm,
    expected_ww_ppm, expected_bw_ppm): observed join counts plus
    exact nonfree-sampling expected edge fractions (x 10^6)."""
    e = _decorated_edges(
        nodes, edges, id_col, b_col, src_col, dst_col, broadcast_nodes
    )
    eagg = e.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("w"),
        F.sum(((F.col("xs") == 1) & (F.col("xd") == 1)).cast("long")).alias(
            "bb"
        ),
        F.sum(((F.col("xs") == 0) & (F.col("xd") == 0)).cast("long")).alias(
            "ww"
        ),
        F.sum((F.col("xs") != F.col("xd")).cast("long")).alias("bw"),
    )
    moments = nodes.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(b_col).cast("long")).alias("nb"),
    )
    row = moments.crossJoin(F.broadcast(eagg))
    ok = (F.col("w") > 0) & (F.col("n") > 1)

    def frac_ppm(num_expr: str):
        return F.when(
            ok, F.expr(f"({num_expr}) * 1000000 div (n * (n - 1))")
        )

    return row.select(
        F.col("n").alias("n_nodes"),
        F.col("nb").alias("n_black"),
        F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("w_edges"),
        F.coalesce(F.col("bb"), F.lit(0).cast("long")).alias("bb"),
        F.coalesce(F.col("ww"), F.lit(0).cast("long")).alias("ww"),
        F.coalesce(F.col("bw"), F.lit(0).cast("long")).alias("bw"),
        frac_ppm("nb * (nb - 1)").alias("expected_bb_ppm"),
        frac_ppm("(n - nb) * (n - nb - 1)").alias("expected_ww_ppm"),
        frac_ppm("2 * nb * (n - nb)").alias("expected_bw_ppm"),
    )
