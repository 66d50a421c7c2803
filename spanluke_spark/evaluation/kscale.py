"""k-group rank machinery past the omnibus: the Conover squared-rank
scale test (Conover & Iman 1978; median-centered variant) — do k
crawl cohorts share a common DISPERSION (the k-group generalization
of Mood's squared-rank q389, as Kruskal-Wallis generalizes
Mann-Whitney) — and Dunn's post-hoc pairwise test (Dunn 1964) — once
Kruskal-Wallis fires, WHICH cohort pairs actually differ, with the
Bonferroni family-wise correction built in.

Conover — exactness: each row is centered on its GROUP's TRUE
median (the Brown-Forsythe median-centering the repo's Levene lane
q358 already uses; doubling clears the even-n half exactly:
d = |2x - (x_(lo) + x_(hi))| with the two central order statistics
from the tie-aware per-group cumulative walk — both engines derive
the same integer). Pooled doubled midranks DR of d give integer squared scores
s = DR^2 (exactly the q389 score map, now k groups). With
T_j = sum s over group j, S = sum s, Q = sum s^2:

  per-group cells (q379 discipline, no equal-size contract):
    cell_j = T_j^2 * 1000 div n_j            (once-quantized milli)
  a_milli = sum_j cell_j - (S^2 * 1000 div N)
  chi2_milli = (N - 1) * a_milli * N div (N*Q - S^2)

— one quantization per group plus ONE final division, wide
intermediates on DECIMAL(38,0)/HUGEINT, df = k-1 against the
embedded chi-square table. Long-bound contract on the quantized
cell: T_j^2*1000/n_j <= 16*N^5*1000 must fit int64, i.e.
N <= ~700 rows total (stated; the DECIMAL stage itself never
overflows — only the per-group long cell caps the regime). Identical groups with n_j | 1000*T_j^2
and N | 1000*S^2 make a_milli EXACTLY 0 (divisibility stated in the
fixture). Zero-spread-everywhere (every d == 0 -> N*Q == S^2) ->
NULL, status 'degenerate'; k < 2 likewise.

Dunn — exactness: pooled doubled midranks of the RAW values; with
U_j = sum DR over group j and the tie term TT = sum (c^3 - c) over
value classes, each pair (j, l) clears to ONE exact rational
(the 4 from doubling folds against the 12 of the rank variance):

  z2_jl = 3 * (N - 1) * (n_l*U_j - n_j*U_l)^2
          / ( n_j * n_l * (n_j + n_l)
              * (N*(N+1)*(N-1) - TT) )

quantized once to milli. The Bonferroni gate compares z2 against
the chi-square(1) quantile at 0.05/m (m = k(k-1)/2 pairs), embedded
as milli constants for k <= 10 — each is (Phi^-1(1 - 0.025/m))^2,
recomputed FROM the stdlib NormalDist inside the pytest so the
table cannot rot. Identical groups -> every z2 EXACTLY 0; a single
shifted group fires exactly its own k-1 pairs. All-values-tied
(N(N+1)(N-1) == TT) -> NULL, status 'degenerate'.

Distributed shape: value-class groupBys + bounded rank windows; the
pair frame is k(k-1)/2 rows (k <= 10 contract for the verdict gate;
larger k emits z2 with NULL verdict). Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["conover_scale", "dunn_pairs"]

_CHI2_95_MILLI = {
    1: 3841, 2: 5991, 3: 7815, 4: 9488, 5: 11070,
    6: 12592, 7: 14067, 8: 15507, 9: 16919, 10: 18307,
}

# chi-square(1) 0.95 quantiles under Bonferroni 0.05/m, x1000:
# (Phi^-1(1 - 0.025/m))^2 for m = k(k-1)/2, k <= 10 — public normal
# quantiles, quantized once; the pytest recomputes these from
# statistics.NormalDist and asserts equality.
_BONF_MILLI = {
    1: 3841, 3: 5731, 6: 6960, 10: 7879, 15: 8615,
    21: 9230, 28: 9758, 36: 10220, 45: 10633,
}


def _dr_window(cls: DataFrame, cnt: str = "c") -> DataFrame:
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    return cls.withColumn(
        "dr",
        2 * (F.sum(cnt).over(wv) - F.col(cnt)) + F.col(cnt) + 1,
    )


def conover_scale(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp, x int) -> ONE row (n_total, k, a_milli, chi2_milli, df,
    crit_milli, sig05, status): median-centered Conover squared-rank
    dispersion test."""
    s = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(x_col).cast("long").alias("x"),
    )
    # per-group lower median on doubled values (even-n halves exact)
    gcls = s.groupBy("g", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wg = Window.partitionBy("g").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gcum = gcls.withColumn("cum", F.sum("c").over(wg)).withColumn(
        "n_g", F.sum("c").over(Window.partitionBy("g"))
    )
    med = gcum.groupBy("g").agg(
        (
            F.min(
                F.when(
                    2 * F.col("cum")
                    >= F.col("n_g") + (F.col("n_g") % 2),
                    F.col("x"),
                )
            )
            + F.min(
                F.when(
                    2 * F.col("cum")
                    >= F.col("n_g") - (F.col("n_g") % 2) + 2,
                    F.col("x"),
                )
            )
        ).alias("dmed")
    )
    centered = s.join(F.broadcast(med), "g").select(
        "g", F.abs(2 * F.col("x") - F.col("dmed")).alias("x")
    )
    cls = centered.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ranked = _dr_window(cls).select(
        "x", (F.col("dr") * F.col("dr")).alias("s")
    )
    rows = centered.join(F.broadcast(ranked), "x")
    per_g = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("s").alias("t_g"),
    )
    tot = rows.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("s").alias("s_all"),
        F.sum(F.col("s") * F.col("s")).alias("q_all"),
    )
    cells = per_g.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(
            F.expr(
                "cast(cast(t_g as decimal(38,0)) * t_g * 1000"
                " div n_g as long)"
            )
        ).alias("cell_sum"),
    )
    out = tot.crossJoin(F.broadcast(cells)).withColumn(
        "a_milli",
        F.expr(
            "cell_sum - cast(cast(s_all as decimal(38,0)) * s_all"
            " * 1000 div nn as long)"
        ),
    )
    den = F.expr(
        "cast(nn as decimal(38,0)) * q_all"
        " - cast(s_all as decimal(38,0)) * s_all"
    )
    ok = (F.col("k") >= 2) & (den > 0)
    chi2 = F.expr(
        "cast(cast(sign(a_milli) as long) *"
        " ((nn - 1) * cast(abs(a_milli) as decimal(38,0)) * nn"
        "  div (cast(nn as decimal(38,0)) * q_all"
        "       - cast(s_all as decimal(38,0)) * s_all)) as long)"
    )
    dfree = F.col("k") - 1
    crit = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in _CHI2_95_MILLI.items() for v in kv]
        ),
        dfree.cast("int"),
    )
    return out.select(
        F.col("nn").alias("n_total"),
        "k",
        F.when(ok, F.col("a_milli")).alias("a_milli"),
        F.when(ok, chi2).alias("chi2_milli"),
        F.when(ok, dfree).alias("df"),
        F.when(ok & dfree.between(1, 10), crit).alias("crit_milli"),
        F.when(ok & dfree.between(1, 10), chi2 > crit).alias(
            "sig05"
        ),
        F.when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def dunn_pairs(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp, x int) -> k(k-1)/2 rows (g_a, g_b, n_a, n_b, u_a, u_b,
    z2_milli, m_pairs, crit_milli, sig_bonf05, status), g_a < g_b:
    Dunn's pairwise rank z^2 with exact tie correction and the
    Bonferroni milli gate."""
    s = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ranked = _dr_window(cls)
    tie = cls.groupBy().agg(
        F.sum(
            F.col("c") * F.col("c") * F.col("c") - F.col("c")
        ).alias("tt"),
        F.sum("c").alias("nn"),
    )
    rows = s.join(F.broadcast(ranked.select("x", "dr")), "x")
    per_g = rows.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum("dr").alias("u_g"),
    )
    a = per_g.select(
        F.col("g").alias("g_a"),
        F.col("n_g").alias("n_a"),
        F.col("u_g").alias("u_a"),
    )
    b = per_g.select(
        F.col("g").alias("g_b"),
        F.col("n_g").alias("n_b"),
        F.col("u_g").alias("u_b"),
    )
    k_row = per_g.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    pairs = (
        a.crossJoin(b)
        .where(F.col("g_a") < F.col("g_b"))
        .crossJoin(F.broadcast(tie))
        .crossJoin(F.broadcast(k_row))
    )
    den_ok = F.expr("nn * (nn + 1) * (nn - 1) - tt > 0")
    z2 = F.expr(
        "cast(3 * (nn - 1)"
        " * cast(n_b * u_a - n_a * u_b as decimal(38,0))"
        " * (n_b * u_a - n_a * u_b) * 1000"
        " div (cast(n_a as decimal(38,0)) * n_b * (n_a + n_b)"
        "      * (nn * (nn + 1) * (nn - 1) - tt)) as long)"
    )
    m_pairs = F.expr("k * (k - 1) div 2")
    crit = F.element_at(
        F.create_map(
            *[F.lit(v) for kv in _BONF_MILLI.items() for v in kv]
        ),
        m_pairs.cast("int"),
    )
    return pairs.select(
        "g_a",
        "g_b",
        "n_a",
        "n_b",
        "u_a",
        "u_b",
        F.when(den_ok, z2).alias("z2_milli"),
        m_pairs.alias("m_pairs"),
        F.when(den_ok, crit).alias("crit_milli"),
        F.when(den_ok & crit.isNotNull(), z2 > crit).alias(
            "sig_bonf05"
        ),
        F.when(~den_ok, F.lit("degenerate"))
        .when(crit.isNull(), F.lit("k_out_of_table"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
