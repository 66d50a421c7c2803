"""Exact linear-rank SCALE tests: Ansari-Bradley (Ansari & Bradley
1960) and Mood's squared-rank scale test (Mood 1954) — do two crawl
cohorts differ in DISPERSION (latency jitter, doc-length spread,
score variance) even when their medians agree? The scale-alternative
companions of Mann-Whitney (q246, location) and Brown-Forsythe
(q358, moment-based): rank tests stay exact under any monotone
transform and need no normality.

Shared engine — any linear rank statistic T = sum_{group A} s(r_i)
is exact under the permutation null via the finite-population
(simple-random-sample) moments, which handle ties for free when the
scores are built from average ranks:

  E[T]   = m * S / N                    (S = sum of all scores)
  Var[T] = m * n * (N * sum s^2 - S^2) / (N^2 * (N - 1))

  z^2    = (N*T - m*S)^2 * (N - 1) / (m * n * (N*sum s^2 - S^2))

— an exact integer rational once the scores are integers. Integer
scores from DOUBLE ranks DR_i = 2*avg_rank_i (the q296/q386
discipline, integer even under ties):

  Ansari-Bradley:  d_i = min(DR_i, 2*(N+1) - DR_i)    (= 2*s_AB)
  Mood scale:      q_i = (DR_i - (N+1))^2             (= 4*s_Mood)

the constant score scalings cancel in z^2 exactly. One value-class
rank window + one aggregate; no pair join, no sort of the raw rows.

Quantization: z2_milli = num * 1000 div den with the 2^63-safe
intermediate carried in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) —
the quotient itself is small. Significance by the same wide-integer
cross-multiplication against the chi-square(1) 0.95 point:
sig05 iff num * 10^6 > 3841459 * den (3.841459 = quantized
chi2_{1,0.95}, constant stated; z^2 is one-sided in magnitude).
Degenerate lanes: either group empty, or all scores equal (den == 0
— e.g. N = 2, or constant data) surface NULL. Long-bound contract
BEFORE the decimal stage: T, S, sum s^2 all fit comfortably for
N <= ~10^4; the decimal stage then never overflows its 38 digits
(num <= ~1e18 * 1e6 = 24 digits).

Distributed shape: ONE groupBy to value classes, one bounded rank
window over distinct values, one decorated join back, ONE aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["ansari_bradley", "mood_scale", "lepage"]


def _linear_rank_test(
    df: DataFrame,
    group_col: str,
    x_col: str,
    score_name: str,
) -> DataFrame:
    """Shared exact linear-rank engine. group_col: 0 = treatment (T
    sums its scores), anything else control. score_name picks the
    integer score map applied to the double rank DR."""
    s = df.select(
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "x",
        (
            2 * (F.sum("c").over(wv) - F.col("c")) + F.col("c") + 1
        ).alias("dr"),
    )
    rows = s.join(F.broadcast(ranked), "x")
    n_row = s.groupBy().agg(F.count(F.lit(1)).cast("long").alias("nn"))
    rows = rows.crossJoin(F.broadcast(n_row))
    if score_name == "ansari":
        score = F.least(
            F.col("dr"), 2 * (F.col("nn") + 1) - F.col("dr")
        )
    elif score_name == "wilcoxon":
        score = F.col("dr")
    elif score_name == "mood":
        d = F.col("dr") - (F.col("nn") + 1)
        score = d * d
    else:  # pragma: no cover - internal
        raise ValueError(score_name)
    scored = rows.select(
        "is_a", "nn", score.cast("long").alias("s")
    )
    agg = scored.groupBy("nn").agg(
        F.sum(F.col("is_a").cast("long")).alias("m"),
        F.sum((~F.col("is_a")).cast("long")).alias("n"),
        F.sum(F.when(F.col("is_a"), F.col("s")).otherwise(0)).alias(
            "t_stat"
        ),
        F.sum("s").alias("s_all"),
        F.sum(F.col("s") * F.col("s")).alias("s2_all"),
    )
    base = agg.select(
        F.col("nn").alias("n_total"),
        "m",
        "n",
        "t_stat",
        "s_all",
        (
            (F.col("nn") * F.col("t_stat") - F.col("m") * F.col("s_all"))
            * (
                F.col("nn") * F.col("t_stat")
                - F.col("m") * F.col("s_all")
            )
            * (F.col("nn") - 1)
        ).alias("z2_num"),
        (
            F.col("m")
            * F.col("n")
            * (
                F.col("nn") * F.col("s2_all")
                - F.col("s_all") * F.col("s_all")
            )
        ).alias("z2_den"),
    )
    ok = (F.col("m") > 0) & (F.col("n") > 0) & (F.col("z2_den") > 0)
    return base.select(
        "n_total",
        "m",
        "n",
        "t_stat",
        "s_all",
        "z2_num",
        "z2_den",
        F.when(
            ok,
            F.expr(
                "cast(z2_num as decimal(38,0)) * 1000 div z2_den"
            ),
        ).alias("z2_milli"),
        F.when(
            ok,
            F.expr(
                "cast(z2_num as decimal(38,0)) * 1000000"
                " > cast(z2_den as decimal(38,0)) * 3841459"
            ),
        ).alias("sig05"),
    )


def ansari_bradley(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int) -> ONE row (n_total, m, n, t_stat, s_all,
    z2_num, z2_den, z2_milli, sig05): Ansari-Bradley dispersion test
    on doubled center-distance scores min(DR, 2(N+1)-DR); a SMALL
    t_stat vs E[T] means group 0 holds the extremes (wider spread)."""
    return _linear_rank_test(df, group_col, x_col, "ansari")


def mood_scale(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int) -> ONE row (same columns): Mood's squared
    rank-distance scale test on (DR - (N+1))^2 scores; a LARGE
    t_stat vs E[T] means group 0 holds the extremes."""
    return _linear_rank_test(df, group_col, x_col, "mood")


def lepage(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """Lepage joint location-scale test (Lepage 1971) — did the
    cohort move OR spread? L = z_Wilcoxon^2 + z_AnsariBradley^2,
    against chi-square(2): the omnibus the single-purpose lanes
    (Mann-Whitney q246 location, Ansari-Bradley q388 scale) each
    miss half of. Composed EXACTLY from this module's linear-rank
    engine run twice — Wilcoxon scores are the double ranks
    themselves, AB scores the folded center distances — and the two
    quantized z2_milli cells ADD (quantize-then-sum, stated; each
    cell is the q388 exact rational before one trunc).

    -> ONE row (n_total, m, n, z2_w_milli, z2_ab_milli, l_milli,
    sig05) with sig05 at the chi-square(2) 0.95 point 5991
    (quantized constant, stated); either component NULL (constant
    data, empty group) surfaces NULL L."""
    w = _linear_rank_test(df, group_col, x_col, "wilcoxon").select(
        "n_total",
        "m",
        "n",
        F.col("z2_milli").alias("z2_w_milli"),
    )
    ab = _linear_rank_test(df, group_col, x_col, "ansari").select(
        F.col("z2_milli").alias("z2_ab_milli")
    )
    base = w.crossJoin(F.broadcast(ab))
    l_val = F.col("z2_w_milli") + F.col("z2_ab_milli")
    ok = F.col("z2_w_milli").isNotNull() & F.col(
        "z2_ab_milli"
    ).isNotNull()
    return base.select(
        "n_total",
        "m",
        "n",
        "z2_w_milli",
        "z2_ab_milli",
        F.when(ok, l_val).alias("l_milli"),
        F.when(ok, l_val > 5991).alias("sig05"),
    )
