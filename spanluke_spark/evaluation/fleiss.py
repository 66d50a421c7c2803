"""Fleiss' kappa (Fleiss 1971) — chance-corrected agreement for n > 2
raters, the multi-rater companion to Cohen's kappa (two raters,
`agreement.py`) and Krippendorff's alpha (missing data): do the n
annotation runs / silver-label sources assign the same categories to
the same items more than their marginals predict?

With N items each rated by exactly n raters into k categories
(n_ij = raters putting item i in category j; c_j = column totals):

  P_bar  = (sum_ij n_ij^2 - N n) / (N n (n-1))
  P_e    = sum_j c_j^2 / (N n)^2
  kappa  = (P_bar - P_e) / (1 - P_e)

All three are EXACT rationals on integer counts; kappa is carried as
(kappa_num, kappa_den) over the common denominator and reported
once-quantized as sign-split trunc-ppm:

  A = sum_ij n_ij^2 - N n          B = N n (n - 1)
  E = sum_j c_j^2                  G = (N n)^2
  kappa_num = A G - B E            kappa_den = B (G - E)

kappa is NULL when P_e = 1 (one category everywhere). Items without
exactly n ratings are DROPPED (Fleiss requires a constant panel) and
counted in n_dropped. Overflow: A <= N n^2 and G <= (N n)^2, so the
cross products stay under 2^63 for N n up to ~55,000 — the agreement
table is annotation-sized, not corpus-sized; everything reduces in
two map-side-combinable groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fleiss_kappa"]


def fleiss_kappa(
    ratings: DataFrame,
    n_raters: int,
    item_col: str = "item",
    category_col: str = "category",
) -> DataFrame:
    """(item, category) one row per rating -> ONE row: (n_items,
    n_raters, n_dropped, pbar_ppm, pe_ppm, kappa_num, kappa_den,
    kappa_ppm)."""
    r = ratings.select(
        F.col(item_col).alias("item"), F.col(category_col).alias("category")
    )
    per_item_cat = r.groupBy("item", "category").agg(
        F.count(F.lit(1)).cast("long").alias("nij")
    )
    per_item = per_item_cat.groupBy("item").agg(
        F.sum("nij").cast("long").alias("n_i"),
        F.sum(F.col("nij") * F.col("nij")).cast("long").alias("sq_i"),
    )
    kept = per_item.where(F.col("n_i") == n_raters)
    dropped = per_item.where(F.col("n_i") != n_raters).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    cat_tot = (
        per_item_cat.join(kept.select("item"), "item", "left_semi")
        .groupBy("category")
        .agg(F.sum("nij").cast("long").alias("cj"))
        .groupBy()
        .agg(F.sum(F.col("cj") * F.col("cj")).cast("long").alias("e"))
    )
    base = kept.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("sq_i").cast("long").alias("sq"),
    )
    x = (
        base.crossJoin(F.broadcast(cat_tot))
        .crossJoin(F.broadcast(dropped.select(
            F.coalesce(F.col("n_dropped"), F.lit(0)).alias("n_dropped")
        )))
        .select(
            "n_items",
            F.lit(n_raters).cast("long").alias("n_raters"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("sq") - F.col("n_items") * n_raters).alias("a"),
            (F.col("n_items") * n_raters * (n_raters - 1)).alias("b"),
            F.coalesce("e", F.lit(0)).alias("e"),
            (
                F.col("n_items") * n_raters * F.col("n_items") * n_raters
            ).alias("g"),
        )
    )
    x = x.select(
        "n_items",
        "n_raters",
        "n_dropped",
        F.expr("a * 1000000 div b").alias("pbar_ppm"),
        F.expr("e * 1000000 div g").alias("pe_ppm"),
        (F.col("a") * F.col("g") - F.col("b") * F.col("e")).alias(
            "kappa_num"
        ),
        (F.col("b") * (F.col("g") - F.col("e"))).alias("kappa_den"),
    )
    mag = F.expr("abs(kappa_num) * 1000000 div kappa_den")
    return x.withColumn(
        "kappa_ppm",
        F.when(F.col("kappa_den") == 0, F.lit(None).cast("long")).otherwise(
            F.when(F.col("kappa_num") < 0, -mag).otherwise(mag).cast("long")
        ),
    )
