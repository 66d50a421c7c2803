"""Homogeneity of odds ratios across strata — the legitimacy check
the stratified-pooling lanes assume: Mantel-Haenszel (q425/q323)
pools per-stratum 2x2 odds ratios into one common OR, which is only
meaningful if the strata SHARE an OR. Woolf's test (Woolf 1955) and
the Breslow-Day test with Tarone's correction (Breslow & Day 1980;
Tarone 1985) are the two standard answers; both ship here, and the
pytest fires/quiets them together on shared fixtures.

Woolf — exact discipline: per stratum (a, b, c, d), the log odds
ratio is micro-nat integer-argument cells (q421 discipline)

  L = lnq(a*d) - lnq(b*c)        lnq(x) = round(ln(x) * 1e6)

and the inverse-variance weight is the EXACT rational
w = abcd / (bcd + acd + abd + abc) (clears 1/(1/a+1/b+1/c+1/d)),
once-quantized to milli: w_m = a*b*c*d * 1000 div (...). With
X = sum w_m*L, Y = sum w_m*L^2, Z = sum w_m:

  chi2 = Y - X^2/Z   (in milli*micro^2 units)
  chi2_milli = (Y - X^2 div Z) div 10^12

— one trunc per stratum (w_m), one X^2 div Z, one final rescale,
wide stages on DECIMAL(38,0)/HUGEINT. IDENTICAL per-stratum tables
make X^2 exactly divisible by Z (X = k*w*L, Z = k*w => X^2/Z =
k*w*L^2 = Y) so chi2 is EXACTLY 0. Strata with any zero cell have
no finite log-OR and are DROPPED AND COUNTED (the Friedman/Fleiss
contract; the Haldane +0.5 smoothing is deliberately NOT applied —
stated). df = k_used - 1 against the embedded chi-square table.

Breslow-Day — a DOCUMENTED FLOAT LANE (q406/q437 precedent: exact
integer cells upstream, double arithmetic downstream, both engines
evaluating the same expressions): the MH common odds ratio
R = sum(a*d/T) / sum(b*c/T), the fitted cell a_hat as the
admissible root of the quadratic (1-R)x^2 + (R*(m1+n1) + T - m1
- n1)x - R*m1*n1 = 0 with margins fixed, the asymptotic variance
V = 1/(1/a_hat + 1/(m1-a_hat) + 1/(n1-a_hat) + 1/(T-m1-n1+a_hat)),
BD = sum (a - a_hat)^2 / V, and Tarone's correction
BDT = BD - (sum(a - a_hat))^2 / sum(V) (removes the slight
anticonservatism when R is MH- rather than MLE-estimated). Both
rounded once to milli; fixtures sit away from rounding boundaries
(stated). Same drop-and-count zero-cell policy, same chi-square
verdict at df = k_used - 1.

Distributed shape (both): strata arrive as one row per stratum of
exact integer cells (a groupBy upstream); everything here is one
aggregate over k rows plus broadcast 1-row totals (Breslow-Day
needs R first — a second 1-row broadcast). Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["woolf_homogeneity", "breslow_day"]

_CHI2_95_MILLI = {
    1: 3841, 2: 5991, 3: 7815, 4: 9488, 5: 11070,
    6: 12592, 7: 14067, 8: 15507, 9: 16919, 10: 18307,
}


def _crit(df_col):
    return F.element_at(
        F.create_map(
            *[F.lit(v) for kv in _CHI2_95_MILLI.items() for v in kv]
        ),
        df_col.cast("int"),
    )


def _cells(df, s, a, b, c, d):
    return df.select(
        F.col(s).alias("s"),
        F.col(a).cast("long").alias("a"),
        F.col(b).cast("long").alias("b"),
        F.col(c).cast("long").alias("c"),
        F.col(d).cast("long").alias("d"),
        (
            (F.col(a) > 0)
            & (F.col(b) > 0)
            & (F.col(c) > 0)
            & (F.col(d) > 0)
        ).alias("keep"),
    )


def woolf_homogeneity(
    df: DataFrame,
    stratum_col: str = "s",
    a_col: str = "a",
    b_col: str = "b",
    c_col: str = "c",
    d_col: str = "d",
) -> DataFrame:
    """One row per stratum (s, a, b, c, d) -> ONE row (k_used,
    dropped, chi2_milli, df, crit_milli, sig05, status)."""
    rows = _cells(df, stratum_col, a_col, b_col, c_col, d_col)
    kept = rows.where("keep").select(
        F.expr(
            "cast(round(ln(cast(a * d as double)) * 1000000) as"
            " long)"
            " - cast(round(ln(cast(b * c as double)) * 1000000) as"
            " long)"
        ).alias("l"),
        F.expr(
            "cast(cast(a as decimal(38,0)) * b * c * d * 1000"
            " div (cast(b as decimal(38,0)) * c * d"
            "    + cast(a as decimal(38,0)) * c * d"
            "    + cast(a as decimal(38,0)) * b * d"
            "    + cast(a as decimal(38,0)) * b * c) as long)"
        ).alias("w_m"),
    )
    agg = kept.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum(F.expr("cast(w_m as decimal(38,0)) * l")).alias("x"),
        F.sum(F.expr("cast(w_m as decimal(38,0)) * l * l")).alias(
            "y"
        ),
        F.sum("w_m").alias("z"),
    )
    drops = rows.groupBy().agg(
        F.coalesce(
            F.sum((~F.col("keep")).cast("long")), F.lit(0)
        ).alias("dropped")
    )
    out = agg.crossJoin(F.broadcast(drops))
    ok = (F.col("k_used") >= 2) & (F.col("z") > 0)
    chi2 = F.expr(
        "cast((y - x * x div z) div 1000000000000 as long)"
    )
    dfree = F.col("k_used") - 1
    return out.select(
        "k_used",
        "dropped",
        F.when(ok, chi2).alias("chi2_milli"),
        F.when(ok, dfree).alias("df"),
        F.when(ok & dfree.between(1, 10), _crit(dfree)).alias(
            "crit_milli"
        ),
        F.when(ok & dfree.between(1, 10), chi2 > _crit(dfree)).alias(
            "sig05"
        ),
        F.when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def breslow_day(
    df: DataFrame,
    stratum_col: str = "s",
    a_col: str = "a",
    b_col: str = "b",
    c_col: str = "c",
    d_col: str = "d",
    tarone: bool = True,
) -> DataFrame:
    """One row per stratum -> ONE row (k_used, dropped, r_ppm,
    bd_milli, bdt_milli, df, crit_milli, sig05, status); sig05
    gates the Tarone-corrected statistic when tarone=True."""
    rows = _cells(df, stratum_col, a_col, b_col, c_col, d_col)
    kept = rows.where("keep")
    r_row = kept.groupBy().agg(
        F.sum(
            F.expr(
                "cast(a as double) * d / (a + b + c + d)"
            )
        ).alias("rp"),
        F.sum(
            F.expr(
                "cast(b as double) * c / (a + b + c + d)"
            )
        ).alias("rq"),
    )
    per = kept.crossJoin(F.broadcast(r_row)).select(
        "a",
        F.expr("rp / rq").alias("r"),
        F.expr("cast(a + b as double)").alias("m1"),
        F.expr("cast(a + c as double)").alias("n1"),
        F.expr("cast(a + b + c + d as double)").alias("t"),
    )
    fitted = per.select(
        "a",
        "r",
        "m1",
        "n1",
        "t",
        F.expr(
            "case when abs(r - 1.0d) < 1e-12 then m1 * n1 / t"
            " else (-(r * (m1 + n1) + t - m1 - n1)"
            "       + sqrt((r * (m1 + n1) + t - m1 - n1)"
            "              * (r * (m1 + n1) + t - m1 - n1)"
            "              + 4 * (1 - r) * r * m1 * n1))"
            "      / (2 * (1 - r)) end"
        ).alias("ah"),
    ).select(
        "a",
        "r",
        "ah",
        F.expr(
            "1.0d / (1.0d / ah + 1.0d / (m1 - ah) + 1.0d / (n1 - ah)"
            " + 1.0d / (t - m1 - n1 + ah))"
        ).alias("v"),
    )
    agg = fitted.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("r").alias("r"),
        F.sum(F.expr("(a - ah) * (a - ah) / v")).alias("bd"),
        F.sum(F.expr("a - ah")).alias("dev"),
        F.sum("v").alias("v_sum"),
    )
    drops = rows.groupBy().agg(
        F.coalesce(
            F.sum((~F.col("keep")).cast("long")), F.lit(0)
        ).alias("dropped")
    )
    out = agg.crossJoin(F.broadcast(drops))
    ok = (F.col("k_used") >= 2) & (F.col("v_sum") > 0)
    bd_m = F.expr("cast(round(bd * 1000) as long)")
    bdt_m = F.expr(
        "cast(round((bd - dev * dev / v_sum) * 1000) as long)"
    )
    gate = bdt_m if tarone else bd_m
    dfree = F.col("k_used") - 1
    return out.select(
        "k_used",
        "dropped",
        F.when(ok, F.expr("cast(round(r * 1000000) as long)")).alias(
            "r_ppm"
        ),
        F.when(ok, bd_m).alias("bd_milli"),
        F.when(ok, bdt_m).alias("bdt_milli"),
        F.when(ok, dfree).alias("df"),
        F.when(ok & dfree.between(1, 10), _crit(dfree)).alias(
            "crit_milli"
        ),
        F.when(ok & dfree.between(1, 10), gate > _crit(dfree)).alias(
            "sig05"
        ),
        F.when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
