"""CD / disruption index (Funk & Owen-Smith, Management Science 2017;
Wu, Wang & Evans, Nature 2019 "Large teams develop and small teams
disrupt") over the citation graph (graph/citations.py builds the
edges; this scores them): does a focal work ECLIPSE its references
(later papers cite it alone) or CONSOLIDATE them (later papers cite it
together with its references)?

For a focal node f with reference set R(f) = {r : f -> r}, partition
the later papers p != f that engage the neighborhood:

  n_i = |{p : p -> f, p cites no r in R(f)}|   (disrupting citations)
  n_j = |{p : p -> f, p -> some r in R(f)}|    (consolidating)
  n_k = |{p : p -> some r in R(f), p not -> f}| (bypassing)

  CD(f) = (n_i - n_j) / (n_i + n_j + n_k)  in [-1, 1]

CD = +1: every engaging paper cites f and ignores its sources — f
replaced them. CD -> -1: everyone citing f also (or only) cites the
sources — f is a bridge, not a break.

Relational shape for ALL focal nodes at once (never per-focal loops):
citers = edges reversed; ref-citers = one self-join edges⋈edges on
the shared reference (cited = ref), distinct (f, p), p != f;
n_j by inner join citers⋈ref-citers, n_k by left_anti, n_i by
difference — three shuffles on (f, p) keys total, all map-side
combinable aggregations. Exact-integer contract: counts are longs and
cd_ppm = trunc-toward-zero of (n_i - n_j) * 10^6 / (n_i+n_j+n_k),
emitted with the exact (cd_num, cd_den) rational so the sign-sensitive
rounding can never wobble across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["disruption_index"]


def disruption_index(
    edges: DataFrame, src: str = "citer", dst: str = "cited"
) -> DataFrame:
    """edges (citer -> cited) -> one row per focal node that has at
    least one citer or one bypassing ref-citer: (f, n_i, n_j, n_k,
    cd_num, cd_den, cd_ppm)."""
    e = edges.select(F.col(src).alias("citer"), F.col(dst).alias("cited")).distinct()
    citers = e.select(F.col("cited").alias("f"), F.col("citer").alias("p"))
    refs = e.select(F.col("citer").alias("f"), F.col("cited").alias("r"))
    # p cites some reference of f (p != f: f trivially cites its refs)
    ref_citers = (
        refs.join(
            e.select(F.col("cited").alias("r"), F.col("citer").alias("p")),
            "r",
        )
        .where(F.col("p") != F.col("f"))
        .select("f", "p")
        .distinct()
    )
    nj = (
        citers.join(ref_citers, ["f", "p"], "left_semi")
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_j"))
    )
    ni = (
        citers.join(ref_citers, ["f", "p"], "left_anti")
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    nk = (
        ref_citers.join(citers, ["f", "p"], "left_anti")
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    out = (
        ni.join(nj, "f", "full")
        .join(nk, "f", "full")
        .select(
            "f",
            F.coalesce("n_i", F.lit(0)).alias("n_i"),
            F.coalesce("n_j", F.lit(0)).alias("n_j"),
            F.coalesce("n_k", F.lit(0)).alias("n_k"),
        )
    )
    num = (F.col("n_i") - F.col("n_j")).cast("long")
    den = (F.col("n_i") + F.col("n_j") + F.col("n_k")).cast("long")
    out = out.withColumn("cd_num", num).withColumn("cd_den", den)
    # trunc-toward-zero ppm (Spark's integer div truncates; spelled out
    # sign-split so the oracle can replay it without floor/trunc
    # ambiguity)
    mag = F.expr("abs(cd_num) * 1000000 div cd_den")
    return out.withColumn(
        "cd_ppm",
        F.when(F.col("cd_den") == 0, F.lit(None))
        .otherwise(F.when(num < 0, -mag).otherwise(mag))
        .cast("long"),
    )
