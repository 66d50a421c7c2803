"""Matthews correlation + Fowlkes-Mallows (binary confusion panel)
and Lin's concordance correlation coefficient (Matthews 1975; Fowlkes
& Mallows 1983; Lin 1989).

Web-scale use: accuracy is meaningless on imbalanced crawl labels
(99% non-legal pages -> a constant classifier scores 0.99); MCC is
the single-number confusion summary that stays honest under
imbalance, and FM = sqrt(precision*recall) is its retrieval-flavored
sibling. Lin's CCC answers the model-swap question the Pearson r
(q265) cannot: a re-scored corpus can correlate perfectly yet
disagree badly — CCC charges for location/scale departures from the
45-degree line.

Sqrt-free exactness (the q311 |ARI|<=1 discipline): both MCC and FM
carry SIGNED SQUARES so no engine evaluates a square root —

  mcc2_ppm = sign(TP*TN - FP*FN) * (TP*TN - FP*FN)^2 * 10^6
             div ((TP+FP)(TP+FN)(TN+FP)(TN+FN))
  fm2_ppm  = TP^2 * 10^6 div ((TP+FP)(TP+FN))

(|MCC| = sqrt(|mcc2|/1e6), exact rationals before the single trunc).
Any zero marginal surfaces NULL (MCC undefined). Long-bound contract:
|TP*TN - FP*FN| <= (n/2)^2 needs n <= ~2000 for the ppm scaling; the
callers use bounded evaluation slices (the q330 contract).

Lin's CCC is exact by n^2 cross-multiplication — with integer inputs

  ccc = 2*s_xy / (s_x^2 + s_y^2 + (mx - my)^2)
      = 2*(n*Sxy - Sx*Sy)
        / ((n*Sxx - Sx^2) + (n*Syy - Sy^2) + (Sx - Sy)^2)

numerator and denominator are exact integers; one sign-split trunc to
ppm. Identities pinned by pytest: y == x gives exactly 10^6; y == x+c
gives the closed form 2*Dx/(2*Dx + n^2*c^2); |CCC| <= |Pearson r|
(Lin 1989 Section 2) cross-checked in floats.

Distributed shape: each is ONE aggregate over the scored pairs — no
shuffle beyond the partial/final agg, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mcc_fm", "lin_ccc", "multiclass_mcc"]


def mcc_fm(
    scored: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
) -> DataFrame:
    """(truth bool, pred bool) -> ONE row (tp, fp, fn, tn, mcc2_ppm,
    fm2_ppm): signed-square MCC and squared Fowlkes-Mallows, exact
    rationals, one trunc each; NULL on any zero marginal."""
    t = F.col(truth_col)
    p = F.col(pred_col)
    agg = scored.groupBy().agg(
        F.sum((t & p).cast("long")).alias("tp"),
        F.sum((~t & p).cast("long")).alias("fp"),
        F.sum((t & ~p).cast("long")).alias("fn"),
        F.sum((~t & ~p).cast("long")).alias("tn"),
    )
    den = F.expr("(tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)")
    num = F.expr("tp * tn - fp * fn")
    mag = F.expr(
        "(tp * tn - fp * fn) * (tp * tn - fp * fn) * 1000000"
        " div ((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))"
    )
    mcc2 = F.when(den > 0, F.when(num < 0, -mag).otherwise(mag))
    fm_den = F.expr("(tp + fp) * (tp + fn)")
    fm2 = F.when(fm_den > 0, F.expr("tp * tp * 1000000 div ((tp + fp) * (tp + fn))"))
    return agg.select(
        "tp", "fp", "fn", "tn",
        mcc2.alias("mcc2_ppm"),
        fm2.alias("fm2_ppm"),
    )


def lin_ccc(
    pairs: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(x, y) integer-valued pairs -> ONE row (n, num, den, ccc_ppm):
    Lin's concordance, exact n^2-cross-multiplied integers, one
    sign-split trunc; constant inputs (den == 0) surface NULL."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = pairs.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    z = agg.select(
        "n",
        F.expr("2 * (n * sxy - sx * sy)").alias("num"),
        F.expr(
            "(n * sxx - sx * sx) + (n * syy - sy * sy)"
            " + (sx - sy) * (sx - sy)"
        ).alias("den"),
    )
    mag = F.expr("abs(num) * 1000000 div den")
    ccc = F.when(
        F.col("den") > 0, F.when(F.col("num") < 0, -mag).otherwise(mag)
    )
    return z.select("n", "num", "den", ccc.alias("ccc_ppm"))


def multiclass_mcc(
    scored: DataFrame,
    truth_col: str = "truth",
    pred_col: str = "pred",
) -> DataFrame:
    """Multiclass Matthews correlation R_K (Gorodkin 2004) — the
    K-class generalization of mcc_fm's MCC, the single-number
    confusion summary for the 4+ label taggers (lang-id, doc-type,
    NER label audits) where binary MCC does not apply and accuracy
    is still imbalance-blind.

    With confusion counts c_kk (diagonal), truth marginals t_k, pred
    marginals p_k and N rows:

      num  = N * sum_k c_kk - sum_k t_k * p_k
      rk2  = num^2 / ((N^2 - sum p_k^2) (N^2 - sum t_k^2))

    carried as the signed square (the q354/q311 sqrt-free
    discipline): rk2_ppm = sign(num) * num^2 * 10^6 div den — exact
    integers, one trunc. A constant truth or constant pred zeroes a
    den factor -> NULL. Pinned by pytest: K = 2 reproduces
    mcc_fm's mcc2_ppm EXACTLY (same integers after algebra), perfect
    agreement gives 10^6, consistent relabeling of both columns
    changes nothing, and independent columns give 0. Long bound:
    num^2 * 10^6 <= N^4 * 10^6 needs N <= ~5000 per slice.

    (truth label, pred label) -> ONE row (n, k_classes, agree, num,
    rk2_ppm)."""
    s = scored.select(
        F.col(truth_col).cast("string").alias("t"),
        F.col(pred_col).cast("string").alias("p"),
    )
    base = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("t") == F.col("p")).cast("long")).alias("agree"),
    )
    tm = s.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("tk"))
    pm = s.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("pk"))
    cross = (
        tm.join(pm, tm["t"] == pm["p"], "full")
        .select(
            F.coalesce(F.col("tk"), F.lit(0).cast("long")).alias("tk"),
            F.coalesce(F.col("pk"), F.lit(0).cast("long")).alias("pk"),
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("k_classes"),
            F.sum(F.col("tk") * F.col("pk")).alias("tp_cross"),
            F.sum(F.col("tk") * F.col("tk")).alias("t2"),
            F.sum(F.col("pk") * F.col("pk")).alias("p2"),
        )
    )
    x = base.crossJoin(F.broadcast(cross)).select(
        "n",
        "k_classes",
        "agree",
        F.expr("n * agree - tp_cross").alias("num"),
        F.expr("(n * n - p2) * (n * n - t2)").alias("den"),
    )
    mag = F.expr("num * num * 1000000 div den")
    rk2 = F.when(
        F.col("den") > 0, F.when(F.col("num") < 0, -mag).otherwise(mag)
    )
    return x.select("n", "k_classes", "agree", "num", rk2.alias("rk2_ppm"))
