"""Rich-club coefficient (Zhou & Mondragon 2004) — do the high-degree
hosts of a web graph preferentially link to EACH OTHER? A link-farm /
collusion signal the per-node metrics (degree q88, clustering q152,
k-core q108) don't expose: phi(k) close to 1 among the top-degree
nodes means the hubs form a near-clique, the classic paid-link-ring
shape; an uncorrelated graph keeps phi(k) near the background
density.

  phi(k) = 2 * E_k / (N_k * (N_k - 1))

with N_k the nodes of degree > k and E_k the edges with BOTH
endpoints of degree > k — exact rational, one trunc to ppm per k;
N_k < 2 surfaces NULL (phi undefined).

Exactness: degrees are exact integer counts over the canonicalized
simple edge set (lo < hi, self-loops dropped, duplicates collapsed);
the whole k-sweep 1..k_max is ONE constant fan-out explode
(F.sequence) over edges and nodes — no per-k jobs, no driver loop.
Closed forms pinned by pytest: the complete graph gives exactly 10^6
at every defined k; the ring (all degrees 2) gives
phi(1) = 2*10^6 div (N-1) and NULL at k >= 2; a planted hub clique
sweeps phi up to exactly 10^6 once only the clique survives.

Distributed shape: one degree aggregate, one broadcast degree join to
each endpoint, two constant-fan-out explodes, one groupBy(k) — edge
count x k_max rows at peak, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rich_club"]


def rich_club(
    edges: DataFrame,
    k_max: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Undirected edges (src, dst) -> one row per k in 1..k_max:
    (k, n_k, e_k, phi_ppm); phi_ppm NULL where n_k < 2."""
    e = (
        edges.select(
            F.least(src_col, dst_col).alias("lo"),
            F.greatest(src_col, dst_col).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
    )
    deg = (
        e.select(F.col("lo").alias("node"))
        .unionByName(e.select(F.col("hi").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    ks = F.explode(F.sequence(F.lit(1), F.lit(k_max))).alias("k")
    nk = (
        deg.select("deg", ks)
        .where(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_k"))
    )
    ed = (
        e.join(
            F.broadcast(deg.select(F.col("node").alias("lo"),
                                   F.col("deg").alias("dlo"))),
            "lo",
        )
        .join(
            F.broadcast(deg.select(F.col("node").alias("hi"),
                                   F.col("deg").alias("dhi"))),
            "hi",
        )
    )
    ek = (
        ed.select(F.least("dlo", "dhi").alias("dmin"), ks)
        .where(F.col("dmin") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("e_k"))
    )
    grid = nk.join(ek, "k", "left").select(
        "k",
        "n_k",
        F.coalesce(F.col("e_k"), F.lit(0).cast("long")).alias("e_k"),
    )
    phi = F.when(
        F.col("n_k") >= 2,
        F.expr("2 * e_k * 1000000 div (n_k * (n_k - 1))"),
    )
    return grid.select("k", "n_k", "e_k", phi.alias("phi_ppm"))
