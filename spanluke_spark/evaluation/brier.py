"""Murphy decomposition of the Brier score (Brier 1950; Murphy 1973):
BS = REL - RES + UNC over binned probability forecasts — the
reliability/resolution split that says WHY a quality scorer's
probabilities are bad: miscalibrated (high REL — fix with the
isotonic lane, q317) or uninformative (low RES — fix the features).
Companion to ECE (calibration.py) and the ROC lane (q296).

With forecasts quantized to integer ppm classes f (the bin IS the
forecast value), per class n_k items, x_k positives; N, X overall:

  REL = (1/N) sum n_k (f_k - o_k)^2     o_k = x_k/n_k
  RES = (1/N) sum n_k (o_k - obar)^2    obar = X/N
  UNC = obar (1 - obar)
  BS  = (1/N) sum_i (f_i - o_i)^2       o_i in {0, 1}

Exactness discipline: the per-class gaps are ONCE-quantized to
sign-split trunc-milli —

  d_milli = (f_ppm·n_k - 10^6·x_k) div (1000·n_k)
  e_milli = (x_k·N - X·n_k)·1000 div (n_k·N)

— then rel/res are exact integer sums of n_k·d², n_k·e² (micro units)
divided once by N; UNC and BS are exact integer formulas on raw
counts (BS expands to x_k(f-10^6)² + (n_k-x_k)f² per class, no
per-item pass). decomp_gap_ppm = bs - (rel - res + unc) is emitted as
the quantization diagnostic (0 when the class rates are milli-exact).
Overflow: BS terms <= n_k·10^12, fine below ~9e6 items; one groupBy,
everything combines map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["brier_decomposition"]


def brier_decomposition(
    preds: DataFrame,
    forecast_col: str = "f_ppm",
    outcome_col: str = "outcome",
) -> DataFrame:
    """(f_ppm: long in [0, 1e6], outcome: boolean) -> ONE row:
    (n, n_bins, bs_ppm, rel_ppm, res_ppm, unc_ppm, decomp_gap_ppm)."""
    bins = preds.groupBy(F.col(forecast_col).alias("f")).agg(
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.sum(F.col(outcome_col).cast("int")).cast("long").alias("xk"),
    )
    tot = bins.groupBy().agg(
        F.sum("nk").alias("n"), F.sum("xk").alias("x")
    )
    x = bins.crossJoin(F.broadcast(tot))

    dnum = F.col("f") * F.col("nk") - F.lit(1_000_000) * F.col("xk")
    dmag = F.expr("abs(f * nk - 1000000 * xk) div (1000 * nk)")
    enum_ = F.col("xk") * F.col("n") - F.col("x") * F.col("nk")
    emag = F.expr("abs(xk * n - x * nk) * 1000 div (nk * n)")
    per = x.select(
        "f",
        "nk",
        "xk",
        "n",
        "x",
        F.when(dnum < 0, -dmag).otherwise(dmag).alias("d_milli"),
        F.when(enum_ < 0, -emag).otherwise(emag).alias("e_milli"),
        F.expr(
            "xk * (f - 1000000) * (f - 1000000) + (nk - xk) * f * f"
        ).alias("bs_term"),
    )
    agg = per.groupBy().agg(
        F.max("n").alias("n"),
        F.max("x").alias("x"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum(F.col("nk") * F.col("d_milli") * F.col("d_milli")).alias(
            "rel_micro"
        ),
        F.sum(F.col("nk") * F.col("e_milli") * F.col("e_milli")).alias(
            "res_micro"
        ),
        F.sum("bs_term").alias("bs_num"),
    )
    out = agg.select(
        "n",
        "n_bins",
        F.expr("bs_num div (1000000 * n)").alias("bs_ppm"),
        F.expr("rel_micro div n").alias("rel_ppm"),
        F.expr("res_micro div n").alias("res_ppm"),
        F.expr("x * (n - x) * 1000000 div (n * n)").alias("unc_ppm"),
    )
    return out.withColumn(
        "decomp_gap_ppm",
        F.col("bs_ppm")
        - (F.col("rel_ppm") - F.col("res_ppm") + F.col("unc_ppm")),
    )
