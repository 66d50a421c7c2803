"""Crawl-coverage estimation — "how much of the web (or of the entity
/vocabulary universe) have we actually seen?" — by two published
closed-form estimators, both exact-integer here:

1. **Two-sample capture-recapture** (Lincoln-Petersen; the
   bias-corrected Chapman 1951 estimator): treat two crawl snapshots
   as capture samples over the same item universe. With n_a items in
   snapshot A, n_b in B and m in both, the Chapman population estimate
   is  N̂ = (n_a+1)(n_b+1)/(m+1) - 1  — the standard ecology estimator,
   unbiased when m > 0 and defined even at m = 0 (where raw
   Lincoln-Petersen divides by zero). Identity gate: A == B gives
   exactly N̂ = n.

2. **Chao1 species-richness lower bound** (Chao 1984, bias-corrected
   form): S_chao1 = S_obs + f1(f1-1) / (2(f2+1)) from the
   frequency-of-frequencies head — how many distinct items (entities,
   vocabulary types, hosts) the corpus has INCLUDING the never-seen
   tail. Complements textops/profile.py's Good-Turing missing MASS
   (probability the next token is new) with a missing COUNT.

Integer contract: estimates carry exact (num, den) rationals plus the
floor value — N̂ = chapman_num/chapman_den - 1, S = s_obs +
chao1_num/chao1_den — so the cross-engine hash can never wobble.

Distributed shape: everything reduces by exact distinct/groupBy over
the item key (map-side combinable; at most |vocabulary| rows survive
the first agg, then frequency-of-frequencies is |distinct counts|
rows, then one row). The 10^12-scale approximate path is
textops/sketch.py (KMV) / the HLL lane (q239) — this is the exact
twin used for calibration and tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chapman_estimate", "chao1_richness", "crawl_coverage"]


def chapman_estimate(
    items_a: DataFrame, items_b: DataFrame, item_col: str = "item"
) -> DataFrame:
    """One row (n_a, n_b, m_overlap, chapman_num, chapman_den,
    n_hat) from two distinct-item relations: N̂ = num/den - 1,
    n_hat = its floor."""
    a = items_a.select(F.col(item_col).alias("item")).distinct()
    b = items_b.select(F.col(item_col).alias("item")).distinct()
    both = a.join(b, "item", "left_semi")
    stats = (
        a.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(both.agg(F.count(F.lit(1)).alias("m_overlap")))
    )
    num = (F.col("n_a") + 1) * (F.col("n_b") + 1)
    den = F.col("m_overlap") + 1
    # integer `div`, not `/`: float division loses exactness once the
    # numerator exceeds 2^53
    return stats.select(
        "n_a",
        "n_b",
        "m_overlap",
        num.cast("long").alias("chapman_num"),
        den.cast("long").alias("chapman_den"),
    ).withColumn(
        "n_hat",
        F.expr("chapman_num div chapman_den - 1").cast("long"),
    )


def chao1_richness(
    occurrences: DataFrame, item_col: str = "item"
) -> DataFrame:
    """One row (s_obs, f1, f2, chao1_num, chao1_den, s_chao1) from an
    occurrence relation (one row per item sighting): bias-corrected
    Chao1 = s_obs + f1(f1-1)/(2(f2+1)), s_chao1 = its floor."""
    counts = occurrences.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("c")
    )
    fof = counts.groupBy("c").agg(F.count(F.lit(1)).alias("f"))
    stats = fof.agg(
        F.sum("f").alias("s_obs"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 1, F.col("f"))), F.lit(0)
        ).alias("f1"),
        F.coalesce(
            F.sum(F.when(F.col("c") == 2, F.col("f"))), F.lit(0)
        ).alias("f2"),
    )
    num = F.col("f1") * (F.col("f1") - 1)
    den = 2 * (F.col("f2") + 1)
    return stats.select(
        "s_obs",
        "f1",
        "f2",
        num.cast("long").alias("chao1_num"),
        den.cast("long").alias("chao1_den"),
    ).withColumn(
        "s_chao1",
        F.expr("s_obs + chao1_num div chao1_den").cast("long"),
    )


def crawl_coverage(
    snap_a: DataFrame,
    snap_b: DataFrame,
    item_col: str = "item",
) -> DataFrame:
    """One row combining both estimators over two crawl snapshots:
    Chapman population estimate from the A/B overlap, Chao1 richness
    from the pooled occurrence multiset, and the exact coverage
    fraction seen_num/seen_den = S_obs(pooled) / N̂_chapman (floor ppm
    for a single sortable number)."""
    chap = chapman_estimate(snap_a, snap_b, item_col)
    pooled = snap_a.select(item_col).unionByName(snap_b.select(item_col))
    chao = chao1_richness(pooled, item_col)
    out = chap.crossJoin(F.broadcast(chao))
    # coverage = s_obs / (num/den - 1) = s_obs*den / (num - den)
    seen_den = F.col("chapman_num") - F.col("chapman_den")
    return out.withColumn(
        "coverage_ppm",
        F.when(
            seen_den > 0,
            F.expr(
                "(s_obs * chapman_den * 1000000)"
                " div (chapman_num - chapman_den)"
            ),
        )
        .otherwise(F.lit(None))
        .cast("long"),
    )
