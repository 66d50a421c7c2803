"""Wald's sequential probability ratio test (Wald 1945) — per-source
sequential accept/reject for Bernoulli quality streams: stop fetching
from a crawl source as soon as the evidence crosses a boundary,
instead of fixing the sample size up front. The sequential companion
to the batch binomial audits (q316/q325) and the bandit lane (q284).

Testing H0: p = p0 against H1: p = p1 (p1 > p0), after t ordered
observations with x successes the log likelihood ratio is

  LLR_t = x·ln(p1/p0) + (t - x)·ln((1-p1)/(1-p0))

and the decision boundaries are ln((1-b)/a) (accept H1 at/above) and
ln(b/(1-a)) (accept H0 at/below).

Cross-engine exactness: the four ln constants are quantized ONCE to
round-half-away-from-zero ppm integers — in PYTHON, by
``wald_params`` — and passed as literals, so neither Spark nor the
DuckDB oracle ever computes a logarithm: the cumulative LLR is an
exact integer window sum and every boundary comparison is integer.
The decision is taken at the FIRST crossing (min pos among crossing
rows; the sign of the LLR there picks the hypothesis); sources that
never cross report decision='continue' with t_decide NULL.

Distributed shape: one per-source ordered window cumsum, one
min_by-style agg for the first crossing, one per-source totals agg —
sources are the parallel axis, no joins beyond the group-sized
decision table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sprt", "wald_params"]


def _rnd_ppm(x: float) -> int:
    """round-half-away-from-zero at ppm — the repo's ln-ppm rule."""
    y = x * 1_000_000
    return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))


def wald_params(
    p0: float, p1: float, alpha: float, beta: float
) -> dict[str, int]:
    """The four once-quantized ppm constants of the test (computed
    driver-side so no engine ever evaluates ln)."""
    return {
        "inc1_ppm": _rnd_ppm(math.log(p1 / p0)),
        "inc0_ppm": _rnd_ppm(math.log((1 - p1) / (1 - p0))),
        "upper_ppm": _rnd_ppm(math.log((1 - beta) / alpha)),
        "lower_ppm": _rnd_ppm(math.log(beta / (1 - alpha))),
    }


def sprt(
    trials: DataFrame,
    inc1_ppm: int,
    inc0_ppm: int,
    upper_ppm: int,
    lower_ppm: int,
    group_col: str = "grp",
    pos_col: str = "pos",
    outcome_col: str = "outcome",
) -> DataFrame:
    """(grp, pos, outcome: boolean) -> per grp: (grp, n_seen,
    final_llr_ppm, decision, t_decide, llr_at_decision_ppm)."""
    inc = F.when(
        F.col(outcome_col), F.lit(int(inc1_ppm)).cast("long")
    ).otherwise(F.lit(int(inc0_ppm)).cast("long"))
    w = (
        Window.partitionBy(group_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = trials.select(
        F.col(group_col).alias("grp"),
        F.col(pos_col).alias("pos"),
        F.sum(inc).over(w).alias("llr_ppm"),
    )
    totals = run.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_seen"),
        F.max_by("llr_ppm", "pos").alias("final_llr_ppm"),
    )
    crossing = run.where(
        (F.col("llr_ppm") >= upper_ppm) | (F.col("llr_ppm") <= lower_ppm)
    ).groupBy("grp").agg(
        F.min("pos").cast("long").alias("t_decide"),
        F.min_by("llr_ppm", "pos").alias("llr_at_decision_ppm"),
    )
    out = totals.join(crossing, "grp", "left")
    return out.select(
        "grp",
        "n_seen",
        "final_llr_ppm",
        F.when(F.col("t_decide").isNull(), F.lit("continue"))
        .when(F.col("llr_at_decision_ppm") >= upper_ppm, F.lit("accept_h1"))
        .otherwise(F.lit("accept_h0"))
        .alias("decision"),
        "t_decide",
        "llr_at_decision_ppm",
    )
