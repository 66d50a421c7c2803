"""Priority sampling (Duffield, Lund & Thorup, JACM 2007 "Priority
sampling for estimation of arbitrary subset sums") — the ESTIMATION
side of weighted sampling: keep k items yet answer "what is the total
weight of any subset predicate?" unbiasedly from the sample alone.

sampling.py's Efraimidis-Spirakis sampler picks a weighted sample;
priority sampling additionally ships the Horvitz-Thompson machinery:
each item gets priority q_i = w_i / u_i with u_i uniform in (0,1]; the
k highest-priority items survive, the (k+1)-th priority is the
threshold tau, and the estimator w_hat_i = max(w_i, tau) for sampled i
(0 otherwise) satisfies E[sum over subset] = true subset sum — with
ZERO covariance between items (the paper's landmark property, what
makes per-host / per-lang breakdowns from one sample honest).

Determinism + exactness contract: u_i comes from the portable md5
hash (u_scaled = h % SCALE + 1, a value in [1, SCALE]), priorities are
the exact integers q_i = w_i * SCALE^2 div u_scaled (monotone in the
true rational w_i*SCALE/u_i up to the shared quantization, ties broken
by id), and tau/estimates stay integers — the whole sample and every
estimate replay bit-identically in SQL.

Distributed shape: the top-(k+1) selection is one TakeOrdered-style
ordered limit (Spark plans orderBy+limit as a per-partition top-k plus
a k-row final merge — no global sort materialization); everything
after runs on k rows. Weights and thresholds are longs; w*SCALE^2
bounds weights to ~9e6 at SCALE=1e6 (document weights: token counts —
fine; rescale heavier weights before sampling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import portable_hash64

__all__ = ["priority_sample"]

SCALE = 1_000_000


def priority_sample(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    weight_col: str = "weight",
    salt: str = "psample",
) -> DataFrame:
    """Top-k priority sample with Horvitz-Thompson estimates:
    (id, weight, u_scaled, priority, tau, w_hat) — k rows (fewer iff
    the input has fewer).

    priority = weight * SCALE^2 div u_scaled is the real-valued
    q_i = w_i / u_i carried at SCALE sub-units per weight unit
    (u_real = u_scaled/SCALE, so q_real = w*SCALE/u_scaled and
    priority = q_real * SCALE). tau is the (k+1)-th priority in those
    units (0 when the input has <= k rows — every item sampled,
    w_hat = weight exactly, the estimator's small-population case);
    w_hat = greatest(weight, tau div SCALE) quantizes the threshold
    DOWN to whole weight units, and the exact priority-unit tau is
    emitted beside it for callers that need the unrounded value."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(weight_col).cast("long").alias("weight"),
    ).where(F.col(weight_col) > 0)
    u = portable_hash64(
        F.concat(F.col("id").cast("string"), F.lit(f"|{salt}"))
    ) % SCALE + 1
    pri = base.withColumn("u_scaled", u.cast("long")).withColumn(
        "priority",
        F.expr(f"weight * {SCALE} * {SCALE} div u_scaled"),
    )
    topk1 = pri.orderBy(
        F.desc("priority"), F.asc("id")
    ).limit(k + 1)
    # tau = the smallest (i.e. (k+1)-th) priority of the k+1 head; if
    # the input had <= k rows, tau = 0 and every row survives
    tau = topk1.agg(
        F.when(F.count(F.lit(1)) > k, F.min("priority"))
        .otherwise(F.lit(0))
        .alias("tau")
    )
    w = Window.orderBy(F.desc("priority"), F.asc("id"))
    kept = (
        topk1.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )
    out = kept.crossJoin(F.broadcast(tau))
    return out.select(
        "id",
        "weight",
        "u_scaled",
        "priority",
        "tau",
        F.greatest(
            F.col("weight"), F.expr(f"tau div {SCALE}")
        ).alias("w_hat"),
    )
