"""Cochran's Q test (Cochran 1950) — do k binary classifiers /
extraction rules succeed at the same rate on the SAME n items? The
k-treatment generalization of McNemar (q322) and the binary special
case of the blocked Friedman design (q340): exactly the "which of
these k PII regexes fires" shoot-out, on paired data where k
independent proportions tests would be wrong.

Exactness discipline — binary data makes Q fully exact with NO
per-cell quantization at all: with column totals C_j, row totals
R_i, N = sum R_i,

  Q = (k-1) * sum_j (k*C_j - N)^2 / (k * (k*sum R_i - sum R_i^2))

(the k^2 from centering folds against the k(k-1) prefactor), so
q_milli is ONE sign-free truncating division of exact integers.
Degenerate blocks where every R_i is 0 or k (all-agree rows carry no
information) zero the denominator and surface NULL. Incomplete
blocks are DROPPED and counted (the Friedman/Fleiss contract).
Significance is the integer gate q_milli >= crit_milli against the
caller-supplied published chi-squared df=k-1 critical value.

Cross-lane invariant (gated in pytest): at k = 2, Q reduces exactly
to McNemar's uncorrected (b-c)^2/(b+c).

Distributed shape: one (item) groupBy for row totals + completeness,
one (treatment) groupBy for column totals, 1-row broadcasts only —
corpus-linear, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cochran_q"]


def cochran_q(
    outcomes: DataFrame,
    k: int,
    crit_milli: int,
    item_col: str = "item",
    trt_col: str = "trt",
    x_col: str = "x",
) -> DataFrame:
    """(item, trt, x: 0/1) -> ONE row (n_items, k, n_dropped, n_succ,
    num, den, q_milli, sig)."""
    t = outcomes.select(
        F.col(item_col).alias("item"),
        F.col(trt_col).alias("trt"),
        F.col(x_col).cast("long").alias("x"),
    )
    rows = t.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("bn"),
        F.sum("x").alias("ri"),
    )
    keep = rows.where(F.col("bn") == k)
    drop = rows.where(F.col("bn") != k).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    rstats = keep.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("ri").alias("nsucc"),
        F.sum(F.col("ri") * F.col("ri")).alias("r2"),
    )
    cols = (
        t.join(F.broadcast(keep.select("item")), "item")
        .groupBy("trt")
        .agg(F.sum("x").alias("cj"))
    )
    csum = cols.crossJoin(F.broadcast(rstats)).groupBy().agg(
        F.sum(
            (F.lit(k) * F.col("cj") - F.col("nsucc"))
            * (F.lit(k) * F.col("cj") - F.col("nsucc"))
        ).alias("cdev2")
    )
    x = (
        rstats.crossJoin(F.broadcast(csum))
        .crossJoin(F.broadcast(drop))
        .select(
            "n_items",
            F.lit(k).cast("long").alias("k"),
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias(
                "n_dropped"
            ),
            F.col("nsucc").alias("n_succ"),
            ((k - 1) * F.col("cdev2")).alias("num"),
            F.expr(f"{k} * ({k} * nsucc - r2)").alias("den"),
        )
    )
    q = F.when(F.col("den") > 0, F.expr("num * 1000 div den"))
    return x.select("*", q.alias("q_milli")).select(
        "*", (F.col("q_milli") >= F.lit(crit_milli)).alias("sig")
    )
