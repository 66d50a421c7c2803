"""Top-weighted ranking evaluation: rank-biased precision (Moffat &
Zobel 2008) and AP rank correlation tau_AP (Yilmaz, Aslam & Robertson
2008) — the two standard top-weighted complements to the engine's
uniform-weight lanes: NDCG (q209) needs graded gains, ERR (q362) a
cascade model; RBP models a persistence-p user and comes with an
honest truncation RESIDUAL, and tau_AP is Kendall's tau (q266)
re-weighted so a swap at rank 2 costs more than a swap at rank 200.

RBP exactness: with persistence p = 4/5 (the Moffat-Zobel default)
and binary relevance rel_d over evaluated depth D,

  RBP = (1 - p) * sum_d rel_d * p^(d-1)
      = sum_d rel_d * 4^(d-1) * 5^(D-d)  /  5^D     (exact integers)

  rbp_ppm      = 10^6 * num div 5^D
  residual_ppm = 10^6 * 4^D div 5^D    (p^D — the mass an unseen
                                        tail could still claim)

Long-bound contract: 10^6 * 5^D needs D <= 18 (stated; deeper lists
truncate to their first 18 with the residual saying exactly how much
is unaccounted). The powers are exact in the double pow before the
long cast (< 2^53). rbp_ppm + residual_ppm <= 10^6 + 1 is the
pinned conservation bound (all-relevant list: == exactly).

tau_AP exactness (the once-quantized cell discipline): order items
by system rank; for each system rank i >= 2,

  C_i    = #{j : sys_j < sys_i and truth_j < truth_i}
  cell_i = 10^6 * C_i div (i - 1)
  tau_ap_ppm = 2 * sum(cell) div (n - 1) - 10^6

Identical rankings give EXACTLY +10^6 (every cell is exactly 10^6),
the full reversal exactly -10^6 (every C_i = 0); n < 2 surfaces
NULL. The C_i join is the bounded-slice pair join (the q266
value-class contract: rankings are per-query lists, not the corpus).

Distributed shape: RBP is one powers select + one aggregate per
query key; tau_AP is one self-join on the (bounded) list + two
aggregates. Query keys scale out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rbp", "tau_ap"]


def rbp(
    ranked: DataFrame,
    depth: int = 18,
    key_col: str = "key",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """(key, rank 1-based, rel 0/1) -> per key ONE row (key, d_eval,
    n_rel, rbp_ppm, residual_ppm) at persistence p = 4/5."""
    if not 1 <= depth <= 18:
        raise ValueError("depth must be in 1..18 (long-bound contract)")
    s = ranked.select(
        F.col(key_col).alias("key"),
        F.col(rank_col).cast("long").alias("d"),
        F.col(rel_col).cast("long").alias("rel"),
    ).where(F.col("d") <= depth)
    cells = s.select(
        "key",
        "rel",
        F.expr(
            f"rel * cast(pow(4, d - 1) as bigint)"
            f" * cast(pow(5, {depth} - d) as bigint)"
        ).alias("cell"),
    )
    den = 5**depth
    return cells.groupBy("key").agg(
        F.lit(depth).cast("long").alias("d_eval"),
        F.sum("rel").alias("n_rel"),
        F.expr(f"sum(cell) * 1000000 div {den}").alias("rbp_ppm"),
        F.lit(10**6 * 4**depth // den).cast("long").alias(
            "residual_ppm"
        ),
    )


def tau_ap(
    ranked: DataFrame,
    key_col: str = "key",
    sys_col: str = "sys_rank",
    truth_col: str = "truth_rank",
) -> DataFrame:
    """(key, sys_rank, truth_rank) distinct 1-based ranks per key ->
    per key ONE row (key, n, tau_ap_ppm)."""
    s = ranked.select(
        F.col(key_col).alias("key"),
        F.col(sys_col).cast("long").alias("si"),
        F.col(truth_col).cast("long").alias("ti"),
    ).localCheckpoint(eager=True)
    other = s.select(
        F.col("key").alias("k2"),
        F.col("si").alias("sj"),
        F.col("ti").alias("tj"),
    )
    conc = (
        s.join(
            other,
            (F.col("key") == F.col("k2"))
            & (F.col("sj") < F.col("si"))
            & (F.col("tj") < F.col("ti")),
            "left",
        )
        .groupBy("key", "si")
        .agg(F.sum(F.col("sj").isNotNull().cast("long")).alias("c"))
    )
    cells = conc.where(F.col("si") >= 2).select(
        "key", F.expr("c * 1000000 div (si - 1)").alias("cell")
    )
    n_row = s.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    agg = cells.groupBy("key").agg(
        F.coalesce(F.sum("cell"), F.lit(0).cast("long")).alias("csum")
    )
    return (
        n_row.join(agg, "key", "left")
        .select(
            "key",
            "n",
            F.when(
                F.col("n") >= 2,
                F.expr(
                    "2 * coalesce(csum, 0) div (n - 1) - 1000000"
                ),
            ).alias("tau_ap_ppm"),
        )
    )
