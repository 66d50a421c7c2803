"""Local Outlier Factor (Breunig et al. 2000) over embedding vectors —
density-RELATIVE anomaly scoring for curation: a point is anomalous if
its local density is low compared to its neighbors' densities, which
catches outliers next to tight clusters that a global distance cutoff
(textops/profile.mad_outliers) misses, and complements DBSCAN's hard
noise label (link/dbscan.py) with a graded score.

The paper defines LOF over any dissimilarity d; this implementation
uses the repo's exact integer-quantized squared-L2 (round(x*scale)
BIGINTs, the dbscan/q253 discipline), so k-distances, neighborhoods,
and reachability distances are all EXACT integers — no float-tie
ambiguity anywhere a set is chosen — and the only floats are the final
lrd/LOF ratios of exact integer sums (bit-replayable in the oracle):

  kdist(p)    = k-th smallest d2(p, .) counting multiplicity
  N(p)        = { o != p : d2(p, o) <= kdist(p) }   (>= k on ties)
  reach(p, o) = max(kdist(o), d2(p, o))             (integer)
  lrd(p)      = |N(p)| / sum_{o in N(p)} reach(p, o)
  LOF(p)      = mean_{o in N(p)} lrd(o) / lrd(p)

~1 for points inside uniform-density regions, >> 1 for outliers.

Contract: brute exact pairs — the baseline generator, O(n^2), for
bounded evaluation slices (like q253/q255 fixtures); at crawl scale the
pair stage swaps for the banded candidate generators exactly like every
other pair pipeline here. A point with >= k exact duplicates has
kdist = 0 => sum reach = 0 => lrd/LOF NULL (run exact_dedup first; the
paper's duplicate caveat, surfaced instead of masked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["lof"]


def lof(
    points: DataFrame,
    id_col: str = "id",
    vec_col: str = "vec",
    k: int = 5,
    scale: int = 64,
    d: int | None = None,
) -> DataFrame:
    """(id, vec: array<float>) -> (id, n_neighbors, kdist2, lrd, lof).
    ``d`` truncates vectors to the first d dims (None = full width)."""
    vec = F.col(vec_col) if d is None else F.slice(F.col(vec_col), 1, d)
    q = points.select(
        F.col(id_col).alias("id"),
        F.transform(
            vec, lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("v"),
    ).localCheckpoint(eager=True)
    diff2 = lambda a, b: (a - b) * (a - b)  # noqa: E731
    half = (
        q.alias("a")
        .join(q.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("ia"),
            F.col("b.id").alias("ib"),
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), diff2),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
    )
    sym = half.unionByName(
        half.select(
            F.col("ib").alias("ia"), F.col("ia").alias("ib"), "d2"
        )
    ).localCheckpoint(eager=True)
    w = Window.partitionBy("ia").orderBy("d2", "ib")
    kdist = (
        sym.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == k)
        .select(F.col("ia").alias("id"), F.col("d2").alias("kdist2"))
    )
    # k-distance neighborhoods (value-based: includes ALL ties at kdist)
    neigh = sym.join(
        kdist.withColumnRenamed("id", "ia"), "ia"
    ).where(F.col("d2") <= F.col("kdist2"))
    # reach(p, o) = max(kdist(o), d2) — integer, needs o's k-distance
    reach = neigh.join(
        kdist.select(F.col("id").alias("ib"), F.col("kdist2").alias("_ko")),
        "ib",
    ).select(
        "ia", "ib", F.greatest(F.col("_ko"), F.col("d2")).alias("reach")
    ).localCheckpoint(eager=True)
    lrd = reach.groupBy(F.col("ia").alias("id")).agg(
        F.count(F.lit(1)).alias("n_neighbors"),
        F.try_divide(F.count(F.lit(1)), F.sum("reach")).alias("lrd"),
    )
    scores = (
        reach.select("ia", "ib")
        .join(lrd.select(F.col("id").alias("ib"), F.col("lrd").alias("_lo")), "ib")
        .groupBy(F.col("ia").alias("id"))
        .agg(F.sum("_lo").alias("_sum_lo"), F.count("_lo").alias("_n_lo"))
    )
    return (
        lrd.join(scores, "id")
        .join(kdist, "id")
        .select(
            "id",
            "n_neighbors",
            "kdist2",
            F.round("lrd", 6).alias("lrd"),
            # NULL-lrd neighbors (duplicate clusters) poison the mean:
            # surface NULL instead of a silently-lower score
            F.round(
                F.when(
                    F.col("_n_lo") == F.col("n_neighbors"),
                    F.try_divide(
                        F.col("_sum_lo"), F.col("n_neighbors") * F.col("lrd")
                    ),
                ),
                6,
            ).alias("lof"),
        )
    )
