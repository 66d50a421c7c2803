"""Blocking-quality metrics for entity resolution — the standard triple
(pair completeness, pairs quality, reduction ratio) that decides whether
a candidate generator (LSH bands, canonicalization blocks, sorted
neighborhoods) is safe to put in front of the expensive matcher
(Christen, "Data Matching", ch. 7).

  pair_completeness = |cand ∩ gold| / |gold|        (blocking recall —
                      matches the blocker failed to co-block are LOST)
  pairs_quality     = |cand ∩ gold| / |cand|        (blocking precision)
  reduction_ratio   = 1 - |cand| / (n·(n-1)/2)      (how much of the
                      all-pairs matrix the blocker pruned)

Everything reduces to two distinct-pair counts and one semi-join count —
three shuffles of 16-byte key pairs; the n·(n-1)/2 denominator is a
scalar from the record count, never a materialized cross product. Pairs
are normalized to (min, max) first so direction never splits a pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_pairs(df: DataFrame, a: str, b: str) -> DataFrame:
    lo = F.least(F.col(a), F.col(b))
    hi = F.greatest(F.col(a), F.col(b))
    return (
        df.select(lo.alias("id_a"), hi.alias("id_b"))
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
    )


def blocking_metrics(
    candidates: DataFrame,
    gold: DataFrame,
    n_records: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """candidates(id_a, id_b) x gold(id_a, id_b) -> one row:
    (n_candidates, n_gold, n_hit, pair_completeness, pairs_quality,
    reduction_ratio). ``n_records`` is the blocked corpus size (for the
    all-pairs denominator)."""
    cand = _norm_pairs(candidates, id_a, id_b)
    g = _norm_pairs(gold, id_a, id_b)
    hit = cand.join(g, ["id_a", "id_b"], "left_semi")

    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(g.agg(F.count(F.lit(1)).alias("n_gold")))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
    )
    total_pairs = float(n_records) * (n_records - 1) / 2.0
    return counts.select(
        "n_candidates",
        "n_gold",
        "n_hit",
        (F.col("n_hit") / F.col("n_gold")).alias("pair_completeness"),
        (F.col("n_hit") / F.col("n_candidates")).alias("pairs_quality"),
        (1.0 - F.col("n_candidates") / F.lit(total_pairs)).alias(
            "reduction_ratio"
        ),
    )
