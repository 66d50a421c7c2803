"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969, "A
Theory for Record Linkage" — the model behind Splink, the Census Bureau
matchers, and most production ER): each compared field contributes a
log-likelihood-ratio weight, agreement adds log2(m/u), disagreement adds
log2((1-m)/(1-u)); the summed score is thresholded into
link / possible / non-link.

m (P(agree | same entity)) and u (P(agree | different entities)) are
MODEL PARAMETERS here — estimated offline (EM over blocked samples, or
u from value-frequency tables); this operator is the SCORING/DECISION
stage, the part that runs over the 10^10 candidate pairs. Pure codegen:
per-field CASE arithmetic fused into the candidate scan, no shuffle at
all beyond what the caller's blocking already did (see
canon/canonicalize.py and evaluation/blocking.py for candidate
generation and block quality).
"""

from __future__ import annotations

from math import log2

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_score", "FieldParams"]


class FieldParams:
    """m/u for one compared field; weights precomputed driver-side so the
    plan carries literal doubles."""

    def __init__(self, agree_col: str, m: float, u: float):
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for {agree_col}: m={m} u={u}")
        self.agree_col = agree_col
        self.w_agree = log2(m / u)
        self.w_disagree = log2((1.0 - m) / (1.0 - u))


def fs_score(
    pairs: DataFrame,
    fields: list[FieldParams],
    upper: float = 6.0,
    lower: float = 0.0,
) -> DataFrame:
    """pairs with boolean agreement columns -> pairs + (score, decision).

    decision: 'link' if score >= upper, 'non_link' if score < lower, else
    'possible' (the clerical-review band). A NULL agreement (field missing
    on either side) contributes 0 — the Fellegi-Sunter convention for
    unavailable comparisons. Score rounded to 1e-6 for engine portability.
    """
    score: Column = F.lit(0.0)
    for f in fields:
        a = F.col(f.agree_col)
        score = score + F.when(a.isNull(), 0.0).when(a, f.w_agree).otherwise(
            f.w_disagree
        )
    score = F.round(score, 6)
    decision = (
        F.when(score >= upper, F.lit("link"))
        .when(score < lower, F.lit("non_link"))
        .otherwise(F.lit("possible"))
    )
    return pairs.withColumn("score", score).withColumn("decision", decision)


# ---------------------------------------------------------------------------
# EM parameter estimation (Winkler 1988, "Using the EM algorithm for weight
# computation in the Fellegi-Sunter model of record linkage") — the stage the
# module header deferred "offline", now in-repo and distributed.
# ---------------------------------------------------------------------------

EM_SCALE = 1_000_000  # all probabilities are ppm integers


def _clamp(expr: str) -> str:
    """Keep a ppm probability in [1, EM_SCALE-1] so products never
    degenerate to 0/1 absorbing states (Winkler's standard guard)."""
    return f"least(greatest({expr}, 1), {EM_SCALE - 1})"


def fs_em(
    patterns: DataFrame,
    fields: list[str],
    rounds: int = 4,
    init_p: int = 500_000,
    init_m: int = 900_000,
    init_u: int = 100_000,
) -> DataFrame:
    """EM estimation of the Fellegi-Sunter mixture (match proportion p,
    per-field m_k, u_k) from UNLABELED pair comparisons — one row per
    compared pair with 0/1 agreement columns ``fields``.

    Distributed shape: the only big-data pass is ONE groupBy collapsing
    the 10^10 candidate pairs to at most 2^K agreement-pattern rows
    (map-side combinable); every EM round then runs on that tiny
    summary — E-step responsibilities per pattern, M-step sums — as
    ``rounds`` unrolled relational stages, exactly the shape of the
    Bradley-Terry MM lane (evaluation/preference.py).

    All-integer ppm contract (bit-identical cross-engine): class
    products fold as acc*term div SCALE, responsibilities are
    w = p*Pm div (p*Pm + (1-p)*Pu) in ppm, M-step ratios are
    sum-then-div. Int64-safe to ~9e6 pairs per fit (sum(n*w*SCALE)
    bound); fit on a deterministic sample above that — EM needs a
    sample, not the corpus. Returns one row per field:
    (field, m_ppm, u_ppm, p_ppm, n_pairs) after ``rounds`` rounds.
    """
    K = len(fields)
    gcols = [F.when(F.col(c).cast("int") == 1, 1).otherwise(0).alias(f"g{k}")
             for k, c in enumerate(fields)]
    summary = (
        patterns.select(*gcols)
        .groupBy(*[f"g{k}" for k in range(K)])
        .agg(F.count(F.lit(1)).alias("n"))
    )
    params = summary.sparkSession.createDataFrame(
        [tuple([init_p] + [init_m] * K + [init_u] * K)],
        ", ".join(
            ["p long"]
            + [f"m{k} long" for k in range(K)]
            + [f"u{k} long" for k in range(K)]
        ),
    )
    for _ in range(rounds):
        j = summary.crossJoin(F.broadcast(params))
        pm, pu = str(EM_SCALE), str(EM_SCALE)
        for k in range(K):
            tm = f"(CASE WHEN g{k} = 1 THEN m{k} ELSE {EM_SCALE} - m{k} END)"
            tu = f"(CASE WHEN g{k} = 1 THEN u{k} ELSE {EM_SCALE} - u{k} END)"
            pm = f"(({pm}) * {tm} div {EM_SCALE})"
            pu = f"(({pu}) * {tu} div {EM_SCALE})"
        j = (
            j.withColumn("pm", F.expr(pm))
            .withColumn("pu", F.expr(pu))
            .withColumn("wnum", F.expr(f"p * pm div {EM_SCALE}"))
            .withColumn(
                "wden",
                F.expr(f"wnum + ({EM_SCALE} - p) * pu div {EM_SCALE}"),
            )
            .withColumn(
                "w",
                F.expr(
                    f"CASE WHEN wden = 0 THEN 0"
                    f" ELSE wnum * {EM_SCALE} div wden END"
                ),
            )
        )
        aggs = [
            F.expr("sum(n * w) div sum(n)").alias("p_raw"),
            F.sum(F.expr("n * w")).alias("sw"),
            F.sum(F.expr(f"n * ({EM_SCALE} - w)")).alias("swc"),
            # carry previous params so a degenerate M-step denominator
            # (all-zero responsibilities) keeps them instead of
            # dividing by zero (Spark's div->NULL vs DuckDB's //->error
            # would otherwise diverge)
            *[F.max(f"m{k}").alias(f"prev_m{k}") for k in range(K)],
            *[F.max(f"u{k}").alias(f"prev_u{k}") for k in range(K)],
        ]
        for k in range(K):
            aggs.append(F.sum(F.expr(f"n * w * g{k}")).alias(f"swg{k}"))
            aggs.append(
                F.sum(F.expr(f"n * ({EM_SCALE} - w) * g{k}")).alias(f"swcg{k}")
            )
        sums = j.agg(*aggs)
        sel = [F.expr(_clamp("p_raw")).cast("long").alias("p")]
        for k in range(K):
            sel.append(
                F.expr(
                    f"CASE WHEN sw = 0 THEN prev_m{k} ELSE "
                    + _clamp(f"swg{k} * {EM_SCALE} div sw")
                    + " END"
                ).cast("long").alias(f"m{k}")
            )
        for k in range(K):
            sel.append(
                F.expr(
                    f"CASE WHEN swc = 0 THEN prev_u{k} ELSE "
                    + _clamp(f"swcg{k} * {EM_SCALE} div swc")
                    + " END"
                ).cast("long").alias(f"u{k}")
            )
        params = sums.select(*sel)
    n_pairs = summary.agg(F.sum("n").alias("n_pairs"))
    rows = params.crossJoin(F.broadcast(n_pairs)).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(fields[k]).alias("field"),
                        F.col(f"m{k}").alias("m_ppm"),
                        F.col(f"u{k}").alias("u_ppm"),
                    )
                    for k in range(K)
                ]
            )
        ).alias("s"),
        F.col("p").alias("p_ppm"),
        F.col("n_pairs"),
    ).select("s.field", "s.m_ppm", "s.u_ppm", "p_ppm", "n_pairs")
    return rows
