"""Weighted isotonic regression for probability calibration (the PAVA
fit of Ayer et al. 1955 / Barlow et al. 1972), computed by the exact
minimax closed form (Robertson, Wright & Dykstra 1988, Thm 1.4.4):

  fit(i) = max_{j <= i} min_{k >= i} A(j, k),
  A(j,k) = (Y_k - Y_{j-1}) / (W_k - W_{j-1})   (weighted mean of bins
                                                j..k via prefix sums)

— identical to the sequential pool-adjacent-violators result but with
no sequential pass at all: after one groupBy collapses the corpus to B
score bins (w = count, y = positives), the fit is a B^3-sized
relational min/max over interval means. B is a model-sized calibration
grid (10-100 bins), so B^3 is trivia; the corpus axis reduces fully
map-side — this is the isotonic companion to the ECE reliability lane
(q148), producing the monotone calibrated rate the raw bins lack.

Exactness: every interval mean is carried as the exact integer
rational (num, den); min/max over rationals uses the ORDER-EXACT key

  key = (num * SCALE) div den,  SCALE = 10^10

which preserves strict order whenever den <= 10^5 (two distinct
rationals with den <= 1e5 differ by >= 1/(den_a·den_b) >= 1/SCALE, so
their floor-keys differ; equal rationals floor identically), and
num <= den keeps num·SCALE <= 10^15 inside long range. Ties on key are
therefore exactly the value-equal rationals; (key, den, num) breaks
them deterministically so the reported (num, den) pair is stable.
Callers must keep total weight <= 10^5 per fit group (asserted in the
bin contract, not at runtime — document at call sites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["isotonic_fit"]

SCALE = 10_000_000_000


def isotonic_fit(
    bins: DataFrame,
    bin_col: str = "bin",
    w_col: str = "w",
    y_col: str = "y",
) -> DataFrame:
    """(bin, w, y) -> (bin, w, y, rate_ppm, fit_num, fit_den, fit_ppm)
    with fit nondecreasing in bin. Bins must be 1..B dense (any gaps
    are the caller's bug); w >= 1, 0 <= y <= w."""
    ww = Window.orderBy(bin_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pref = bins.select(
        F.col(bin_col).alias("bin"),
        F.col(w_col).cast("long").alias("w"),
        F.col(y_col).cast("long").alias("y"),
        F.sum(w_col).over(ww).cast("long").alias("cw"),
        F.sum(y_col).over(ww).cast("long").alias("cy"),
    )

    lo = pref.select(
        F.col("bin").alias("j"),
        (F.col("cw") - F.col("w")).alias("w_lo"),
        (F.col("cy") - F.col("y")).alias("y_lo"),
    )
    hi = pref.select(
        F.col("bin").alias("k"),
        F.col("cw").alias("w_hi"),
        F.col("cy").alias("y_hi"),
    )
    ivals = (
        lo.crossJoin(hi)
        .where(F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (F.col("y_hi") - F.col("y_lo")).alias("num"),
            (F.col("w_hi") - F.col("w_lo")).alias("den"),
        )
        .withColumn("key", F.expr(f"num * {SCALE} div den"))
    )

    # inner min over k >= i for each (i, j); outer max over j <= i —
    # the (key, den, num) struct makes rational ties deterministic
    b = pref.select(F.col("bin").alias("i"))
    inner = (
        b.join(ivals, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min(F.struct("key", "den", "num")).alias("mn"))
    )
    outer = inner.groupBy("i").agg(F.max(F.col("mn")).alias("mx"))

    return (
        pref.join(outer, pref["bin"] == outer["i"])
        .select(
            "bin",
            "w",
            "y",
            F.expr("y * 1000000 div w").alias("rate_ppm"),
            F.col("mx.num").alias("fit_num"),
            F.col("mx.den").alias("fit_den"),
            F.expr("mx.num * 1000000 div mx.den").alias("fit_ppm"),
        )
        .orderBy("bin")
    )
