"""Cochran-Mantel-Haenszel stratified 2x2 association (Cochran 1954;
Mantel & Haenszel 1959) — does exposure associate with outcome AFTER
controlling for a confounding stratum (host class, crawl snapshot,
language)? The stratified companion to the marginal chi-squared audit
(q281): pooling strata invites Simpson reversals; CMH tests the
common association across per-stratum tables.

Per stratum (a, b, c, d rows: exposed x outcome), T = a+b+c+d:

  dev   = a - E[a]      = (a*T - (a+b)(a+c)) / T
  var   = (a+b)(c+d)(a+c)(b+d) / (T^2 (T-1))
  CMH   = (sum dev)^2 / (sum var)          (1 df, no continuity corr.)
  OR_MH = (sum a*d/T) / (sum b*c/T)        (Mantel-Haenszel odds ratio)

Exactness discipline: per-stratum terms are ONCE-quantized to
trunc-MILLI (x1000, sign-split so Spark's trunc div and DuckDB's
floor // agree on negatives); every downstream sum, square and ratio
is exact integer arithmetic on those milli values:

  chi2_milli = s_dev_milli^2 div v_milli        (NULL when v = 0)
  or_ppm     = s_ad_milli * 1000000 div s_bc_milli   (NULL when 0)
  sig95/sig99: chi2_milli >= 3841 / 6635 — the published 1-df
  critical values 3.841 / 6.635, compared on the quantized statistic
  (pinned contract).

Degenerate strata (T < 2: variance undefined) are dropped. Overflow:
|dev| <= T/4 so s_dev_milli <= 250·total and the square stays under
2^63 for totals up to ~3.8e8 (ample; the stratum table is model-sized
— corpus rows reduce map-side in one groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cmh_test"]


def cmh_test(
    rows: DataFrame,
    stratum_col: str = "stratum",
    exposed_col: str = "exposed",
    outcome_col: str = "outcome",
) -> DataFrame:
    """(stratum, exposed: boolean, outcome: boolean) rows -> ONE row:
    (k_strata, total, s_dev_milli, v_milli, chi2_milli, sig95, sig99,
    s_ad_milli, s_bc_milli, or_ppm)."""
    e, o = F.col(exposed_col), F.col(outcome_col)
    tab = rows.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.sum((e & o).cast("int")).cast("long").alias("a"),
        F.sum((e & ~o).cast("int")).cast("long").alias("b"),
        F.sum((~e & o).cast("int")).cast("long").alias("c"),
        F.sum((~e & ~o).cast("int")).cast("long").alias("d"),
    )
    t = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    tab = tab.withColumn("t", t).where(F.col("t") >= 2)

    dev_num = F.col("a") * F.col("t") - (F.col("a") + F.col("b")) * (
        F.col("a") + F.col("c")
    )
    mag = F.expr("abs(dev_num) * 1000 div t")
    per = tab.withColumn("dev_num", dev_num).select(
        "stratum",
        "t",
        "a",
        "b",
        "c",
        "d",
        F.when(F.col("dev_num") < 0, -mag).otherwise(mag).alias("dev_milli"),
        F.expr(
            "(a + b) * (c + d) * (a + c) * (b + d) * 1000"
            " div (t * t * (t - 1))"
        ).alias("var_milli"),
        F.expr("a * d * 1000 div t").alias("ad_milli"),
        F.expr("b * c * 1000 div t").alias("bc_milli"),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_strata"),
        F.sum("t").cast("long").alias("total"),
        F.sum("dev_milli").cast("long").alias("s_dev_milli"),
        F.sum("var_milli").cast("long").alias("v_milli"),
        F.sum("ad_milli").cast("long").alias("s_ad_milli"),
        F.sum("bc_milli").cast("long").alias("s_bc_milli"),
    )
    chi2 = F.when(
        F.col("v_milli") > 0,
        F.expr("s_dev_milli * s_dev_milli div v_milli"),
    ).otherwise(F.lit(None).cast("long"))
    return agg.select(
        "*",
        chi2.alias("chi2_milli"),
    ).select(
        "*",
        (F.coalesce(F.col("chi2_milli"), F.lit(0)) >= 3841).alias("sig95"),
        (F.coalesce(F.col("chi2_milli"), F.lit(0)) >= 6635).alias("sig99"),
        F.when(
            F.col("s_bc_milli") > 0,
            F.expr("s_ad_milli * 1000000 div s_bc_milli"),
        )
        .otherwise(F.lit(None).cast("long"))
        .alias("or_ppm"),
    )
