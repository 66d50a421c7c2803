"""2x2 effect-size panel: odds ratio, Yule's Q, relative risk, risk
difference (Cornfield 1951; Yule 1900) — the EFFECT numbers the
2x2 TEST lanes deliberately do not report: Fisher (q332) and the
pooled z (q373) say whether exposure and outcome are associated;
this panel says by HOW MUCH, in the four conventions epidemiology
and spam-audit dashboards actually quote.

With the exposed row (a = exposed & positive, b = exposed & negative)
and unexposed row (c, d):

  or_ppm      = 10^6 * a*d div (b*c)              NULL when b*c == 0
  yule_q_ppm  = sign-split 10^6 * (ad - bc) div (ad + bc)
                (Q = (OR-1)/(OR+1), the [-1,1] rescaling — float
                 identity pytest-pinned)             NULL ad+bc == 0
  rr_ppm      = 10^6 * a*(c+d) div (c*(a+b))      NULL c==0 | a+b==0
  rd_ppm      = sign-split 10^6 * (a*(c+d) - c*(a+b))
                div ((a+b)*(c+d))                 NULL either row 0

every numerator/denominator an exact integer cross product, one
truncating division each (Spark div == DuckDB // after sign split).
Exact lanes pytest-pinned: an independent table (proportional rows)
gives OR == RR == exactly 10^6 and Q == RD == exactly 0; swapping
the rows inverts OR (or_ab * or_ba == 10^12 up to trunc) and negates
Q and RD exactly. Long-bound contract: a,b,c,d <= ~10^6 keeps
10^6 * ad inside int64.

Distributed shape: ONE aggregate over the (exposed, positive)
booleans — map-side combinable, constant output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["two_by_two_effects"]


def two_by_two_effects(
    df: DataFrame,
    exposed_col: str = "exposed",
    positive_col: str = "positive",
) -> DataFrame:
    """(exposed bool, positive bool) one row per unit -> ONE row
    (a, b, c, d, or_ppm, yule_q_ppm, rr_ppm, rd_ppm)."""
    e = F.col(exposed_col).cast("boolean")
    p = F.col(positive_col).cast("boolean")
    agg = df.groupBy().agg(
        F.sum((e & p).cast("long")).alias("a"),
        F.sum((e & ~p).cast("long")).alias("b"),
        F.sum((~e & p).cast("long")).alias("c"),
        F.sum((~e & ~p).cast("long")).alias("d"),
    )
    qnum = F.expr("a * d - b * c")
    qmag = F.expr("abs(a * d - b * c) * 1000000 div (a * d + b * c)")
    rdnum = F.expr("a * (c + d) - c * (a + b)")
    rdmag = F.expr(
        "abs(a * (c + d) - c * (a + b)) * 1000000"
        " div ((a + b) * (c + d))"
    )
    return agg.select(
        "a",
        "b",
        "c",
        "d",
        F.when(
            F.expr("b * c") > 0, F.expr("a * d * 1000000 div (b * c)")
        ).alias("or_ppm"),
        F.when(
            F.expr("a * d + b * c") > 0,
            F.when(qnum < 0, -qmag).otherwise(qmag),
        ).alias("yule_q_ppm"),
        F.when(
            (F.col("c") > 0) & (F.col("a") + F.col("b") > 0),
            F.expr("a * (c + d) * 1000000 div (c * (a + b))"),
        ).alias("rr_ppm"),
        F.when(
            (F.col("a") + F.col("b") > 0)
            & (F.col("c") + F.col("d") > 0),
            F.when(rdnum < 0, -rdmag).otherwise(rdmag),
        ).alias("rd_ppm"),
    )
