"""Per-point silhouette coefficient (Rousseeuw 1987) — the internal
cluster-quality score beside the external agreement lanes (ARI q311,
NMI q331, B-cubed q274): s(i) = (b - a)/max(a, b) with a = mean
dissimilarity to the own cluster and b = the best other-cluster mean,
on the repo's exact integer-quantized squared-L2 dissimilarity (the
LOF lane's metric, q277).

Exactness discipline: per-(point, cluster) dissimilarity sums and
counts are exact integers; the cluster means are quantized ONCE to
trunc-ppm (a_ppm = sum * 10^6 div cnt — non-negative, so Spark div ==
DuckDB //), b is the plain MIN over the quantized other-cluster
means, and

  s_ppm = sign-split trunc ((b_ppm - a_ppm) * 10^6)
                      div greatest(a_ppm, b_ppm)

Singletons take s = 0 with a NULL a_ppm (Rousseeuw's convention);
coincident-point clusters where max(a, b) = 0 also score 0. |s| <= 1
by construction, so s_ppm is in [-10^6, 10^6].

Distributed shape: one bounded pair join (evaluation slices, like the
LOF/kNN lanes — the metric is quadratic by definition), one
(i, cluster_j) groupBy, a conditional split of own vs other means,
and one min-aggregate; no window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["silhouette"]


def _d2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def silhouette(
    pts: DataFrame,
    id_col: str = "id",
    cluster_col: str = "cluster",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, cluster, vec: array<long>) -> per point
    (id, cluster, a_ppm, b_ppm, s_ppm)."""
    p = pts.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        F.col(vec_col).alias("vec"),
    )
    o = p.select(
        F.col("id").alias("jd"),
        F.col("cluster").alias("cj"),
        F.col("vec").alias("vj"),
    )
    pair = p.join(o, F.col("id") != F.col("jd")).select(
        "id",
        "cluster",
        "cj",
        _d2(F.col("vec"), F.col("vj")).alias("d2"),
    )
    per = pair.groupBy("id", "cluster", "cj").agg(
        F.sum("d2").alias("s"), F.count(F.lit(1)).cast("long").alias("c")
    )
    m = per.select(
        "id",
        "cluster",
        "cj",
        F.expr("s * 1000000 div c").alias("m_ppm"),
    )
    own = m.where(F.col("cj") == F.col("cluster")).select(
        "id", F.col("m_ppm").alias("a_ppm")
    )
    other = (
        m.where(F.col("cj") != F.col("cluster"))
        .groupBy("id")
        .agg(F.min("m_ppm").alias("b_ppm"))
    )
    base = (
        p.select("id", "cluster")
        .join(own, "id", "left")
        .join(other, "id", "left")
    )
    diff = F.col("b_ppm") - F.col("a_ppm")
    mx = F.greatest(F.col("a_ppm"), F.col("b_ppm"))
    mag = F.expr("abs(b_ppm - a_ppm) * 1000000 div greatest(a_ppm, b_ppm)")
    return base.select(
        "id",
        "cluster",
        "a_ppm",
        "b_ppm",
        F.when(F.col("a_ppm").isNull() | (mx <= 0), F.lit(0).cast("long"))
        .otherwise(F.when(diff < 0, -mag).otherwise(mag))
        .alias("s_ppm"),
    )
