"""Rand index and adjusted Rand index (Rand 1971; Hubert & Arabie
1985) between two clusterings — the pair-counting member of the
clustering-evaluation family beside B-cubed (q274) and consensus
(q236): dedup-cluster vs golden-truth comparisons report ARI because
it is chance-corrected (two random partitions score ~0, not ~0.5).

All pair counts are CLOSED-FORM from the contingency table — no pair
join: with n_ij the (cluster_a, cluster_b) cell counts, a_i, b_j the
marginals and P(x) = x(x-1)/2,

  agree_same  = sum P(n_ij)
  RI          = 1 - (sum P(a_i) + sum P(b_j) - 2 sum P(n_ij)) / P(n)
  ARI num2    = 2 (P(n) sum P(n_ij) - sum P(a_i) sum P(b_j))
  ARI den2    = P(n)(sum P(a_i) + sum P(b_j)) - 2 sum P(a_i) sum P(b_j)

carried exactly. Overflow discipline: |num2| <= den2 (|ARI| <= 1) and
den2 <= 2 P(n)^2, so at the MAX_ITEMS = 50k guard everything fits a
long EXCEPT num2 * 10^6 — therefore ari_ppm divides the other way
when den2 >= 10^6: abs(num2) div (den2 div 10^6), i.e. the ppm is
computed against the 10^6-truncated denominator (within ~1 ppm of
exact, bit-identical in SQL); below 10^6 the exact
abs(num2)*10^6 div den2 is safe. Larger corpora are compared on a
deterministic slice (the q253 kNN-cap pattern).

Distributed shape: one groupBy for the contingency cells, two
marginal aggs, one final row. Corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["adjusted_rand", "MAX_ITEMS"]

MAX_ITEMS = 50_000


def _p2(c) -> F.Column:
    return (c * (c - 1) / 2).cast("long")


def adjusted_rand(
    df: DataFrame,
    id_col: str = "id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(item id, label_a, label_b) -> one row: (n_items, n_clusters_a,
    n_clusters_b, sum_pair_cells, sum_pair_a, sum_pair_b, ri_ppm,
    ari_ppm). ari_ppm is NULL for the degenerate den2 = 0 (both
    partitions all-singletons or all-one-cluster)."""
    base = df.select(
        F.col(id_col).alias("i"),
        F.col(a_col).alias("ca"),
        F.col(b_col).alias("cb"),
    )
    n = base.count()
    if n > MAX_ITEMS:
        raise ValueError(
            f"adjusted_rand is exact-integer up to {MAX_ITEMS} items"
            f" (got {n}); compare a deterministic slice instead"
        )
    cells = base.groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("c"))
    sc = cells.agg(
        F.sum(_p2(F.col("c"))).alias("s_cells"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    ma = (
        base.groupBy("ca")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(_p2(F.col("c"))).alias("s_a"),
            F.count(F.lit(1)).alias("k_a"),
        )
    )
    mb = (
        base.groupBy("cb")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.sum(_p2(F.col("c"))).alias("s_b"),
            F.count(F.lit(1)).alias("k_b"),
        )
    )
    pn = n * (n - 1) // 2
    out = (
        sc.crossJoin(F.broadcast(ma))
        .crossJoin(F.broadcast(mb))
        .withColumn("n_items", F.lit(n).cast("long"))
        .withColumn("pn", F.lit(pn).cast("long"))
    )
    out = out.withColumn(
        "ri_ppm",
        F.when(F.col("pn") > 0, F.expr(
            "(pn - s_a - s_b + 2 * s_cells) * 1000000 div pn"
        )).otherwise(F.lit(None).cast("long")),
    )
    out = out.withColumn(
        "num2", F.expr("2 * (pn * s_cells - s_a * s_b)")
    ).withColumn("den2", F.expr("pn * (s_a + s_b) - 2 * s_a * s_b"))
    mag = F.expr(
        "CASE WHEN den2 >= 1000000"
        " THEN abs(num2) div (den2 div 1000000)"
        " ELSE abs(num2) * 1000000 div den2 END"
    )
    return out.select(
        "n_items",
        F.col("k_a").alias("n_clusters_a"),
        F.col("k_b").alias("n_clusters_b"),
        F.col("s_cells").alias("sum_pair_cells"),
        F.col("s_a").alias("sum_pair_a"),
        F.col("s_b").alias("sum_pair_b"),
        "ri_ppm",
        F.when(F.col("den2") == 0, F.lit(None).cast("long"))
        .otherwise(F.when(F.col("num2") < 0, -mag).otherwise(mag))
        .alias("ari_ppm"),
    )
