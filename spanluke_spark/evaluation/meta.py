"""Fixed-effect meta-analysis pooling with heterogeneity panel
(Cochran 1954; Higgins & Thompson 2002; DerSimonian & Laird 1986) —
combine per-shard / per-site effect estimates (each with an integer
precision weight w_i, conventionally 1/variance scaled to integers)
into one pooled number, and say HOW MUCH the shards disagree: the
distributed-experimentation closer for the per-stratum lanes (CMH
q323 tests association across strata; this pools magnitudes).

All exact integer rationals on one aggregate (k = #studies,
W = sum w, WY = sum w*y, WYY = sum w*y^2, W2 = sum w^2):

  pooled_milli = sign-split 1000 * WY div W
  Q_num        = W * WYY - WY^2               (Q = Q_num / W >= 0)
  q_milli      = 1000 * Q_num div W           [DECIMAL/HUGEINT]
  excess       = Q_num - (k-1) * W            (Q - df, W-cleared)
  i2_ppm       = 10^6 * max(excess, 0) div Q_num   (I^2, clamped —
                 the standard "negative heterogeneity is 0" rule)
  tau2_milli   = 1000 * max(excess, 0) div (W^2 - W2)  [DL, clamped]

Identical effects give Q_num == 0 EXACTLY, hence q == 0, i2 NULL ->
reported 0 by the clamp convention (stated: i2 is 0 when Q_num == 0,
not NULL — no heterogeneity is measurable and none is present), and
tau2 == 0. k < 2, W == 0, or W^2 == W2 with excess > 0 surface NULL
where division is undefined. Weight convention, stated: w must BE
1/variance on the y scale (integers by quantization), not merely
proportional to it — Q scales with any weight constant while the df
term does not, so Q, I^2 and tau2 all shift under rescaling; only
the pooled mean is scale-free (pytest-pinned both ways).

Long-bound contract: W * WYY needs k * max_w^2 * max|y|^2 <= ~1e14
before the DECIMAL stage (bounded panels, the q330 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["meta_fixed"]


def meta_fixed(
    df: DataFrame, y_col: str = "y", w_col: str = "w"
) -> DataFrame:
    """(y integer effect, w integer weight > 0) one row per study ->
    ONE row (k, w_sum, pooled_milli, q_milli, i2_ppm, tau2_milli)."""
    y = F.col(y_col).cast("long")
    w = F.col(w_col).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(w).alias("w_sum"),
        F.sum(w * w).alias("w2"),
        F.sum(w * y).alias("wy"),
        F.sum(w * y * y).alias("wyy"),
    )
    base = agg.select(
        "k",
        "w_sum",
        "w2",
        "wy",
        F.expr(
            "cast(w_sum as decimal(38,0)) * wyy"
            " - cast(wy as decimal(38,0)) * wy"
        ).alias("q_num"),
    )
    pooled_mag = F.expr("abs(wy) * 1000 div w_sum")
    excess = F.expr(
        "q_num - cast(k - 1 as decimal(38,0)) * w_sum"
    )
    base = base.select(
        "*",
        F.greatest(excess, F.lit(0).cast("decimal(38,0)")).alias(
            "excess_pos"
        ),
    )
    return base.select(
        "k",
        "w_sum",
        F.when(
            F.col("w_sum") > 0,
            F.when(F.col("wy") < 0, -pooled_mag).otherwise(pooled_mag),
        ).alias("pooled_milli"),
        F.when(
            (F.col("k") >= 2) & (F.col("w_sum") > 0),
            F.expr("cast(q_num * 1000 div w_sum as long)"),
        ).alias("q_milli"),
        F.when(
            (F.col("k") >= 2) & (F.col("q_num") > 0),
            F.expr("cast(excess_pos * 1000000 div q_num as long)"),
        )
        .when(
            (F.col("k") >= 2) & (F.col("q_num") == 0),
            F.lit(0).cast("long"),
        )
        .alias("i2_ppm"),
        F.when(
            (F.col("k") >= 2)
            & (
                F.expr("cast(w_sum as decimal(38,0)) * w_sum - w2")
                > 0
            ),
            F.expr(
                "cast(excess_pos * 1000"
                " div (cast(w_sum as decimal(38,0)) * w_sum - w2)"
                " as long)"
            ),
        ).alias("tau2_milli"),
    )
