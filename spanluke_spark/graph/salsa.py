"""SALSA link analysis (Lempel & Moran 2001, "SALSA: The Stochastic
Approach for Link-Structure Analysis") — the random-walk-normalized
sibling of HITS (q78): authority scores are the stationary distribution
of the two-step walk authority -> (uniform in-hub) -> (uniform
out-authority), which famously REDUCES TO A CLOSED FORM — no power
iteration at all (the property Najork's WSDM'07 comparison exploits):

    a(j) = (|A_C| / |A|) * ( d_in(j) / sum_{k in A_C} d_in(k) )

where A_C is the authority side of j's connected component of the
hub-authority bipartite support graph, and symmetrically for hub
scores with out-degrees. So the WHOLE computation is: bipartite
connected components (reusing canon/cc.py's hardened alternating-star
machinery) + degree aggregates + two broadcast-sized component tables —
where HITS needs k full-graph iteration rounds, SALSA needs zero. The
numbers are exact rationals: the lane carries (num, den) BIGINTs
(num = |A_C| * d_in(j), den = |A| * sum_C d_in) plus a ppm projection,
so the cross-engine replay is bit-exact.

The stationarity claim itself (the closed form IS the stationary
distribution of the published chain, component by component, and sums
to the component-size share) is definitionally verified in
tests/test_salsa.py by building the two-step transition matrix in
numpy and checking pi @ P == pi.

Scale shape: CC over the bipartite edge list (O(log^2 n) rounds,
driver fallback for collision-sized graphs), two groupBy aggregates
for degrees, per-component sums join back broadcast (components table
is #components rows). No iteration, no windows over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..canon.cc import connected_components

__all__ = ["salsa_scores"]


def salsa_scores(edges: DataFrame, scale: int = 10**6) -> DataFrame:
    """edges(src, dst) with BIGINT node ids -> one row per (side, node):
    (side 'hub'|'authority', node, deg, comp, score_num, score_den,
    score_ppm). Hubs are nodes with out-links scored on out-degree;
    authorities are nodes with in-links scored on in-degree; each side
    uses ITS OWN component slice of the shared bipartite support graph."""
    e = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).distinct()
    # bipartite encoding: hub u -> 2u, authority v -> 2v+1 (sides are
    # distinct roles of the same page, exactly the SALSA construction)
    bip = e.select(
        (F.col("src") * 2).alias("src"), (F.col("dst") * 2 + 1).alias("dst")
    )
    comp = connected_components(bip)  # (node, component)

    def side(deg_df: DataFrame, name: str, enc_off: int) -> DataFrame:
        d = deg_df.join(
            comp.where(F.col("node") % 2 == enc_off).select(
                F.floor((F.col("node") - enc_off) / 2)
                .cast("long")
                .alias(name_col),
                F.col("component").alias("comp"),
            ),
            name_col,
        )
        per_comp = d.groupBy("comp").agg(
            F.count("*").alias("comp_nodes"),
            F.sum("deg").alias("comp_deg"),
        )
        tot = d.agg(F.count("*").alias("n_side"))
        return (
            d.join(F.broadcast(per_comp), "comp")
            .crossJoin(F.broadcast(tot))
            .select(
                F.lit(name).alias("side"),
                F.col(name_col).alias("node"),
                "deg",
                "comp",
                (F.col("comp_nodes") * F.col("deg")).alias("score_num"),
                (F.col("n_side") * F.col("comp_deg")).alias("score_den"),
                F.round(
                    (F.col("comp_nodes") * F.col("deg")).cast("double")
                    / (F.col("n_side") * F.col("comp_deg")).cast("double")
                    * scale
                )
                .cast("long")
                .alias("score_ppm"),
            )
        )

    name_col = "node_id"
    hubs = e.groupBy(F.col("src").alias(name_col)).agg(
        F.count("*").alias("deg")
    )
    auths = e.groupBy(F.col("dst").alias(name_col)).agg(
        F.count("*").alias("deg")
    )
    # hub rows live at even encodings (offset 0), authorities at odd (1)
    return side(hubs, "hub", 0).unionByName(side(auths, "authority", 1))
