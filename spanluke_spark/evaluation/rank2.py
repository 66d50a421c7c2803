"""Two-sample rank tests beyond Mann-Whitney: Brunner-Munzel (2000)
— the HETEROSKEDASTICITY-ROBUST relative-effect test ("rank Welch"):
Mann-Whitney's variance is computed under exchangeability, so
unequal rank variances break its level; BM estimates each group's
own rank variance, exactly as Welch (q400) repairs Student's t — and
Cucconi (1968) — the joint location-scale omnibus that PREDATES
Lepage (q426) and needs no combination of two tests: one quadratic
form in the squared-rank sums from both ends.

Brunner-Munzel exactness — with doubled pooled midranks DR and
doubled WITHIN-group midranks DW (both integers under ties), let
T_i = sum of DR over group i, u = DR - DW per row,
A_i = n_i * sum(u^2) - (sum u)^2 (the n^2-scaled group variance of
the rank difference). Then the squared BM statistic clears to ONE
exact integer rational (derivation: lawstat's formulation with
every /2 and /4 cancelled):

  bm2 = (n1*T2 - n2*T1)^2 * (n1-1) * (n2-1)
        / ( N^2 * (A1*(n2-1) + A2*(n1-1)) )

and the Satterthwaite-type df clears likewise:

  df = (A1*(n2-1) + A2*(n1-1))^2 * (n1-1) * (n2-1)
       / ( A1^2*(n2-1)^3 + A2^2*(n1-1)^3 )

both once-quantized to milli over DECIMAL(38,0)/HUGEINT. The
relative effect (tie-half-credit P(X < Y)) is exact:
p_hat_ppm = (T2 - n2*(n2+1)) * 10^6 div (2*n1*n2). Verdict lane is
the LARGE-SAMPLE normal gate bm2_milli > 3841 (stated; the
t_{df}-approximation the paper recommends for n < 10 per group is
why df ships as its own column — the q446/q447 asymptotic-verdict
precedent). COMPLETE SEPARATION (every x below every y) makes u
constant within each group -> A1 == A2 == 0 -> the classic
undefined-variance lane, status 'separated', NULL statistic with
p_hat still emitted (it is exactly 0 or 10^6 there). n_i < 2 ->
'degenerate'. Identical multisets -> bm2 EXACTLY 0, p_hat exactly
500000.

Cucconi exactness — NO-TIES contract (declared audit, q446
precedent: distinct-value count must equal N, else status 'ties',
NULL). With S2 = sum R_j^2 and S2r = sum (N+1-R_j)^2 over sample 2
(size n; m = N - n), q = (2N+1)*(8N+11), p = 2*(N^2-4) - q
(so rho = p/q), U-numerator NU = 6*S2 - n*(N+1)*(2N+1),
V-numerator NV = 6*S2r - n*(N+1)*(2N+1), the q^2 in U^2, V^2, U*V
cancels one q against 1 - rho^2 = (q-p)(q+p)/q^2:

  C = 5 * ( q*(NU^2 + NV^2) - 2*p*NU*NV )
      / ( 2*(q-p)*(q+p) * m*n*(N+1) )

ONE exact integer rational (numerator rides DECIMAL(38,0)/HUGEINT;
<= ~10^25 for N <= 10^3, inside 38 digits), c_milli once-quantized.
The null p-value is exp(-C), so the 0.05 verdict is the constant
gate c_milli > 2996 (ln 20 = 2.99573 quantized to the milli,
stated). C >= 0 always (PSD quadratic form, |rho| < 1) — a gated
property. Both engines derive identical integers; no float enters
either lane before the final milli.

Distributed shape (both): ONE value-class groupBy + bounded rank
windows (pooled; BM adds the per-group window), one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["brunner_munzel", "cucconi"]


def brunner_munzel(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int) -> ONE row (n1, n2, t1, t2, a1, a2,
    p_hat_ppm, bm2_milli, df_milli, sig05, status). Group 0 is
    sample 1; p_hat estimates P(X1 < X2) + 0.5 P(=)."""
    s = df.select(
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.col("is_a").cast("long")).alias("ca"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    wp = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "x",
        "ca",
        "cb",
        (
            2 * (F.sum("c").over(wp) - F.col("c")) + F.col("c") + 1
        ).alias("dr"),
        (
            2 * (F.sum("ca").over(wp) - F.col("ca"))
            + F.col("ca")
            + 1
        ).alias("dwa"),
        (
            2 * (F.sum("cb").over(wp) - F.col("cb"))
            + F.col("cb")
            + 1
        ).alias("dwb"),
    )
    rows = s.join(F.broadcast(ranked.drop("ca", "cb")), "x").select(
        "is_a",
        "dr",
        F.when(F.col("is_a"), F.col("dr") - F.col("dwa"))
        .otherwise(F.col("dr") - F.col("dwb"))
        .alias("u"),
    )
    agg = rows.groupBy().agg(
        F.sum(F.col("is_a").cast("long")).alias("n1"),
        F.sum((~F.col("is_a")).cast("long")).alias("n2"),
        F.sum(F.when(F.col("is_a"), F.col("dr")).otherwise(0)).alias(
            "t1"
        ),
        F.sum(
            F.when(~F.col("is_a"), F.col("dr")).otherwise(0)
        ).alias("t2"),
        F.sum(F.when(F.col("is_a"), F.col("u")).otherwise(0)).alias(
            "su1"
        ),
        F.sum(
            F.when(F.col("is_a"), F.col("u") * F.col("u")).otherwise(
                0
            )
        ).alias("qu1"),
        F.sum(F.when(~F.col("is_a"), F.col("u")).otherwise(0)).alias(
            "su2"
        ),
        F.sum(
            F.when(
                ~F.col("is_a"), F.col("u") * F.col("u")
            ).otherwise(0)
        ).alias("qu2"),
    )
    base = agg.select(
        "n1",
        "n2",
        "t1",
        "t2",
        (F.col("n1") * F.col("qu1") - F.col("su1") * F.col("su1")).alias(
            "a1"
        ),
        (F.col("n2") * F.col("qu2") - F.col("su2") * F.col("su2")).alias(
            "a2"
        ),
    )
    ok_n = (F.col("n1") >= 2) & (F.col("n2") >= 2)
    den0 = (
        F.col("a1") * (F.col("n2") - 1)
        + F.col("a2") * (F.col("n1") - 1)
    )
    out = base.withColumn("vden", den0)
    ok = ok_n & (F.col("vden") > 0)
    p_hat = F.expr(
        "(t2 - n2 * (n2 + 1)) * 1000000 div (2 * n1 * n2)"
    )
    bm2 = F.expr(
        "cast("
        " cast(n1 * t2 - n2 * t1 as decimal(38,0))"
        " * (n1 * t2 - n2 * t1) * (n1 - 1) * (n2 - 1) * 1000"
        " div (cast(n1 + n2 as decimal(38,0)) * (n1 + n2) * vden)"
        " as long)"
    )
    df_m = F.expr(
        "cast("
        " cast(vden as decimal(38,0)) * vden * (n1 - 1) * (n2 - 1)"
        " * 1000"
        " div (cast(a1 as decimal(38,0)) * a1 * (n2 - 1) * (n2 - 1)"
        "      * (n2 - 1)"
        "    + cast(a2 as decimal(38,0)) * a2 * (n1 - 1) * (n1 - 1)"
        "      * (n1 - 1))"
        " as long)"
    )
    return out.select(
        "n1",
        "n2",
        "t1",
        "t2",
        "a1",
        "a2",
        F.when(ok_n & (F.col("n1") * F.col("n2") > 0), p_hat).alias(
            "p_hat_ppm"
        ),
        F.when(ok, bm2).alias("bm2_milli"),
        F.when(ok, df_m).alias("df_milli"),
        F.when(ok, bm2 > 3841).alias("sig05"),
        F.when(~ok_n, F.lit("degenerate"))
        .when(F.col("vden") == 0, F.lit("separated"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def cucconi(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int, NO ties) -> ONE row (n_total, m, n, nu, nv,
    c_milli, sig05, status). Group != 0 is sample 2 (the ranked
    one); ties -> status 'ties', NULL."""
    s = df.select(
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum((~F.col("is_a")).cast("long")).alias("cb"),
    )
    wp = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "c",
        "cb",
        F.sum("c").over(wp).alias("r"),
    )
    agg = ranked.groupBy().agg(
        F.sum("c").alias("nn"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_tied"),
        F.sum("cb").alias("n"),
        F.sum(
            F.when(F.col("cb") > 0, F.col("r") * F.col("r")).otherwise(
                0
            )
        ).alias("s2"),
    )
    # s2r needs (N+1-r)^2 — recompute against the total
    agg2 = (
        ranked.crossJoin(
            F.broadcast(agg.select(F.col("nn").alias("nn2")))
        )
        .groupBy()
        .agg(
            F.sum(
                F.when(
                    F.col("cb") > 0,
                    (F.col("nn2") + 1 - F.col("r"))
                    * (F.col("nn2") + 1 - F.col("r")),
                ).otherwise(0)
            ).alias("s2r")
        )
    )
    base = agg.crossJoin(F.broadcast(agg2)).select(
        "nn",
        "n_tied",
        "n",
        (F.col("nn") - F.col("n")).alias("m"),
        (
            6 * F.col("s2")
            - F.col("n") * (F.col("nn") + 1) * (2 * F.col("nn") + 1)
        ).alias("nu"),
        (
            6 * F.col("s2r")
            - F.col("n") * (F.col("nn") + 1) * (2 * F.col("nn") + 1)
        ).alias("nv"),
        ((2 * F.col("nn") + 1) * (8 * F.col("nn") + 11)).alias("q"),
        (
            2 * (F.col("nn") * F.col("nn") - 4)
            - (2 * F.col("nn") + 1) * (8 * F.col("nn") + 11)
        ).alias("p"),
    )
    ok = (
        (F.col("n_tied") == 0)
        & (F.col("m") > 0)
        & (F.col("n") > 0)
        & (F.col("nn") >= 3)
    )
    c_milli = F.expr(
        "cast("
        " 5000 * (cast(q as decimal(38,0)) * (cast(nu as"
        " decimal(38,0)) * nu + cast(nv as decimal(38,0)) * nv)"
        "  - 2 * cast(p as decimal(38,0)) * nu * nv)"
        " div (2 * cast(q - p as decimal(38,0)) * (q + p) * m * n"
        "      * (nn + 1))"
        " as long)"
    )
    return base.select(
        F.col("nn").alias("n_total"),
        "m",
        "n",
        F.when(ok, F.col("nu")).alias("nu"),
        F.when(ok, F.col("nv")).alias("nv"),
        F.when(ok, c_milli).alias("c_milli"),
        F.when(ok, c_milli > 2996).alias("sig05"),
        F.when(F.col("n_tied") > 0, F.lit("ties"))
        .when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
