"""Poisson bootstrap for corpus-metric confidence intervals (Chamandy et
al. 2012, "Estimating Uncertainty for Massive Data Streams" — the Google
formulation used when the classical multinomial bootstrap is impossible
because no worker ever sees the whole dataset).

Each row's weight in replicate b is Poisson(1)-distributed, derived
DETERMINISTICALLY by inverting the Poisson CDF at a uniform u(row, b)
computed from the portable md5 hash — no rand(), so reruns, retries, and
the SQL oracle all see identical replicates (the repo-wide reproducibility
rule; sampling.py plays the same trick for Bernoulli).

Scale shape: the explode to B replicates happens MAP-SIDE and collapses
in the same stage's partial aggregate — the shuffle carries only
(group, replicate) partial sums, i.e. |groups| x B rows regardless of
corpus size. That map-side-combine property is exactly why the Poisson
bootstrap (independent per-row weights) replaces the multinomial one
(weights coupled across rows) on clusters. Replicate means then reduce to
per-group exact interpolated percentiles — |groups| x B input, tiny.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["poisson_weight", "bootstrap_mean_ci", "POISSON1_CDF"]

_M = 1 << 30

# CDF of Poisson(lambda=1) at k = 0..5; weights are capped at 6
# (P(X > 6) ~ 8e-5 ~ one in 12k draws; the cap keeps the CASE finite and
# identical in both engines)
POISSON1_CDF = [
    sum(math.exp(-1.0) / math.factorial(j) for j in range(k + 1))
    for k in range(6)
]


def poisson_weight(id_col: Column, rep: Column) -> Column:
    """Deterministic Poisson(1) weight for (row id, replicate) via inverse
    CDF on a portable-hash uniform."""
    u = (
        F.pmod(
            portable_hash64(
                F.concat(id_col.cast("string"), F.lit(":"), rep.cast("string"))
            ),
            F.lit(_M),
        )
        + 0.5
    ) / float(_M)
    w = F.lit(6)
    for k in range(len(POISSON1_CDF) - 1, -1, -1):
        w = F.when(u < POISSON1_CDF[k], k).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str = "doc_id",
    n_reps: int = 64,
    lo: float = 0.025,
    hi: float = 0.975,
) -> DataFrame:
    """-> (group_col, n_docs, mean_obs, ci_lo, median_boot, ci_hi): the
    observed group mean of value_col plus a percentile CI over ``n_reps``
    deterministic Poisson replicates."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("_b")
    weighted = df.select(
        group_col, value_col, F.col(id_col).alias("_id"), rep
    ).select(
        group_col,
        "_b",
        poisson_weight(F.col("_id"), F.col("_b")).alias("_w"),
        F.col(value_col).cast("double").alias("_v"),
    )
    reps = weighted.groupBy(group_col, "_b").agg(
        (F.sum(F.col("_w") * F.col("_v")) / F.nullif(F.sum("_w"), F.lit(0))).alias(
            "_mean"
        )
    )
    ci = reps.groupBy(group_col).agg(
        F.round(F.percentile("_mean", F.lit(lo)), 6).alias("ci_lo"),
        F.round(F.percentile("_mean", F.lit(0.5)), 6).alias("median_boot"),
        F.round(F.percentile("_mean", F.lit(hi)), 6).alias("ci_hi"),
    )
    obs = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.col(value_col).cast("double")), 6).alias("mean_obs"),
    )
    return obs.join(ci, group_col)
