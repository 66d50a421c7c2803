"""Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) — the
top-weighted similarity between two RANKINGS, the standard audit for
ranker drift ("did the new authority/PageRank/BM25 variant reorder
what users actually see?"): unlike Kendall (q266) it is defined on
indefinite, top-heavy lists and weights rank 1 disagreements far more
than rank-50 ones.

Truncated RBO at depth d with persistence p = 9/10, carried EXACTLY:
(1-p) p^(k-1) = 9^(k-1) / 10^k is an integer rational, so each depth's
term is the exact trunc-ppm

  term_ppm(k) = ov_k * 9^(k-1) * 10^6 div (k * 10^k)

with ov_k = |top_k(A) ∩ top_k(B)| an integer from one groupBy + one
cumulative window (an item enters the overlap at depth max(rank_a,
rank_b) — no per-k recomputation), and rbo@k the running prefix sum.
Depth is capped at 12 so 9^(k-1)*10^6 stays in a long.

Distributed shape: the rankings are the inputs (however they were
computed — a corpus-scale job); RBO itself touches 2d rows. One join
on item, one groupBy(m), one cumulative window over the literal depth
grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["rbo"]

MAX_DEPTH = 12


def rbo(
    rank_a: DataFrame,
    rank_b: DataFrame,
    item_col: str = "item",
    rank_col: str = "rank",
    depth: int = 10,
) -> DataFrame:
    """rank_a/rank_b: (item, rank) with rank 1-based and unique per
    list -> per k in 1..depth: (k, ov, term_ppm, rbo_ppm) where
    rbo_ppm is the truncated-RBO prefix sum at depth k."""
    if not 1 <= depth <= MAX_DEPTH:
        raise ValueError(f"depth must be 1..{MAX_DEPTH}")
    spark = rank_a.sparkSession
    a = rank_a.select(
        F.col(item_col).alias("item"), F.col(rank_col).alias("ra")
    ).where(F.col(rank_col) <= depth)
    b = rank_b.select(
        F.col(item_col).alias("item"), F.col(rank_col).alias("rb")
    ).where(F.col(rank_col) <= depth)
    m = (
        a.join(b, "item")
        .select(F.greatest("ra", "rb").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grid = spark.range(1, depth + 1).select(F.col("id").cast("int").alias("k"))
    joined = grid.join(m, grid["k"] == m["m"], "left").select(
        "k", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    out = joined.withColumn("ov", F.sum("c").over(w).cast("long")).drop("c")
    out = out.withColumn(
        "term_ppm",
        F.expr(
            "ov * cast(round(power(9, k - 1)) as bigint) * 1000000"
            " div (k * cast(round(power(10, k)) as bigint))"
        ),
    )
    return out.withColumn(
        "rbo_ppm", F.sum("term_ppm").over(w).cast("long")
    )
