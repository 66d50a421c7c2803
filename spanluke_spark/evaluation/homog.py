"""k-group homogeneity tests against the POOLED corpus: Mood's
median test (Brown & Mood 1951) — do k crawl cohorts share a common
median (robust location, no distributional assumption at all) — and
Bartlett's test (Bartlett 1937) — do k cohorts share a common
VARIANCE (the normal-theory power companion of Levene/Brown-Forsythe
q358, which stays valid under non-normality where Bartlett fires
spuriously; both lanes state the split).

Mood's median test — exactness: the grand LOWER median (smallest
value whose cumulative count reaches ceil(N/2)) comes from the
tie-aware value-class cumulative window (no full sort); the 2 x k
table of (above median / not above) per group is exact integers, and
the Pearson statistic uses the repo's per-cell identity
(q375/q281 discipline): each of the 2k cells contributes

  cell = (N*o - r*c)^2 * 1000 div (N*r*c)

quantized ONCE to milli (the square rides DECIMAL(38,0)/HUGEINT),
and chi2_milli is their exact integer SUM, df = k-1, against the
embedded chi-square 0.95 table (df <= 10). Degenerate lanes: every
value <= median (r_above == 0, e.g. constant data), r_above == N,
or k < 2 -> NULL with status. The test sees LOCATION only: a fixture
whose groups differ purely in spread around a shared median keeps
every a_j == n_j*R/N and the statistic is EXACTLY 0 — the mirror
image of Ansari-Bradley (q388), which is quiet under pure shift.

Bartlett — exactness discipline: per-group variance is the exact
rational s_i^2 = A_i / (n_i (n_i - 1)) with A_i = n_i*Q_i - S_i^2
(Q = sum x^2, S = sum x, all exact longs); the pooled sum of squares
is once-quantized per group to milli, W_i = A_i * 1000 div n_i
(stated: the ONE quantization ahead of the log stage), U = sum W_i.
The statistic is assembled from per-group RATIO cells so that equal
variances cancel as INTEGERS, not as floats (the q393 "same
rationals quantize identically" trick):

  s_p^2 / s_i^2 = pden_i / pnum_i,
  pnum_i = A_i * 1000 * (N - k),   pden_i = n_i (n_i - 1) * U
  tnum_micro = sum_i (n_i - 1) * (lnq(pden_i) - lnq(pnum_i))

with lnq(x) = round(ln(x) * 1e6) on integer arguments (micro-nat
cells, both engines derive them identically; exactness regime:
pnum, pden < 2^53 so the integer -> double hop is value-preserving —
the caller's contract, comfortable for n_i <= 100, k <= 10,
|x| <= 300). When all groups are identical multisets AND
n_i | 1000*A_i, every pnum_i == pden_i as integers and tnum is
EXACTLY 0. The Bartlett correction
C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)) is carried as
once-quantized ppb harmonic cells (q420 discipline):

  c_ppb = 1e9 + (sum_i (1e9 div (n_i-1)) - 1e9 div (N-k))
                 div (3*(k-1))
  t_milli = sign-split trunc of tnum_micro * 1e6 / c_ppb

(sign-split because Spark `div` truncates toward zero while DuckDB
`//` floors; tnum can dip a few micro-nats negative under rounding).
Groups with n_i < 2 are DROPPED AND COUNTED (they carry no variance
information — the Friedman/Fleiss contract); any surviving group
with zero variance (A_i == 0) makes ln undefined -> NULL statistic,
status 'zero_variance'; fewer than 2 surviving groups -> NULL,
status 'degenerate'. Verdict gate t_milli > crit against the same
chi-square(k-1) 0.95 table.

Distributed shape (both lanes): ONE groupBy to value classes or
per-group moments (map-side combinable), one bounded window over
distinct values (median only), broadcast 1-row margins back; no row
of the corpus is ever sorted, paired, or collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

__all__ = ["mood_median", "bartlett"]

# chi-square 0.95 quantiles x1000, df = 1..10 (public constants,
# quantized once; the verdict threshold is stated to the milli)
_CHI2_95_MILLI = {
    1: 3841, 2: 5991, 3: 7815, 4: 9488, 5: 11070,
    6: 12592, 7: 14067, 8: 15507, 9: 16919, 10: 18307,
}


def _crit_milli(df_col):
    return F.element_at(
        F.create_map(
            *[F.lit(v) for kv in _CHI2_95_MILLI.items() for v in kv]
        ),
        df_col.cast("int"),
    )


def mood_median(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp, x int) -> ONE row (n_total, k, med, r_above,
    chi2_milli, df, crit_milli, sig05, status): Mood's median test
    on the 2 x k above/not-above table at the pooled lower median."""
    s = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(x_col).cast("long").alias("x"),
    )
    cls = s.groupBy("x").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = cls.select("x", F.sum("c").over(wv).alias("cum"))
    tot = s.groupBy().agg(F.count(F.lit(1)).cast("long").alias("nn"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(2 * F.col("cum") >= F.col("nn") + (F.col("nn") % 2))
        .groupBy()
        .agg(F.min("x").alias("med"))
    )
    per_g = (
        s.crossJoin(F.broadcast(med))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum((F.col("x") > F.col("med")).cast("long")).alias(
                "a_g"
            ),
            F.max("med").alias("med"),
        )
    )
    marg = per_g.groupBy().agg(
        F.sum("n_g").alias("nn"),
        F.sum("a_g").alias("r_above"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max("med").alias("med"),
    )
    cells = per_g.drop("med").crossJoin(
        F.broadcast(marg.select("nn", "r_above"))
    )
    top = cells.select(
        F.col("a_g").alias("o"),
        F.col("r_above").alias("r"),
        F.col("n_g").alias("c"),
        "nn",
    )
    bot = cells.select(
        (F.col("n_g") - F.col("a_g")).alias("o"),
        (F.col("nn") - F.col("r_above")).alias("r"),
        F.col("n_g").alias("c"),
        "nn",
    )
    d = (
        "(cast(nn as decimal(38,0)) * o"
        " - cast(r as decimal(38,0)) * c)"
    )
    cell_milli = F.expr(
        f"case when r > 0 then cast({d} * {d} * 1000"
        " div (cast(nn as decimal(38,0)) * r * c) as long) end"
    )
    summed = (
        top.unionByName(bot)
        .select(cell_milli.alias("cell"))
        .groupBy()
        .agg(F.sum("cell").alias("chi2_milli"))
    )
    out = marg.crossJoin(F.broadcast(summed))
    ok = (
        (F.col("k") >= 2)
        & (F.col("r_above") > 0)
        & (F.col("r_above") < F.col("nn"))
    )
    dfree = F.col("k") - 1
    return out.select(
        F.col("nn").alias("n_total"),
        "k",
        "med",
        "r_above",
        F.when(ok, F.col("chi2_milli")).alias("chi2_milli"),
        F.when(ok, dfree).alias("df"),
        F.when(ok, _crit_milli(dfree)).alias("crit_milli"),
        F.when(
            ok & dfree.between(1, 10),
            F.col("chi2_milli") > _crit_milli(dfree),
        ).alias("sig05"),
        F.when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def bartlett(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp, x int) -> ONE row (n_total, k, dropped, tnum_micro,
    c_ppb, t_milli, df, crit_milli, sig05, status): Bartlett's
    equal-variance test on micro-nat ratio cells (see module doc)."""
    s = df.select(
        F.col(group_col).cast("long").alias("g"),
        F.col(x_col).cast("long").alias("x"),
    )
    sized = (
        s.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_g"),
            F.sum("x").alias("s_g"),
            F.sum(F.col("x") * F.col("x")).alias("q_g"),
        )
        .select(
            "g",
            "n_g",
            (
                F.col("n_g") * F.col("q_g")
                - F.col("s_g") * F.col("s_g")
            ).alias("a_g"),
            (F.col("n_g") >= 2).alias("keep"),
        )
    )
    kept = sized.where("keep")
    drops = sized.groupBy().agg(
        F.coalesce(
            F.sum((~F.col("keep")).cast("long")), F.lit(0)
        ).alias("dropped")
    )
    marg = kept.groupBy().agg(
        F.sum("n_g").alias("nn"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.expr("a_g * 1000 div n_g")).alias("u"),
        F.sum(F.expr("1000000000 div (n_g - 1)")).alias("h_ppb"),
        F.min("a_g").alias("a_min"),
    )
    cell = (
        kept.crossJoin(F.broadcast(marg))
        .select(
            (
                (F.col("n_g") - 1)
                * (
                    F.expr(
                        "cast(round(ln(cast(n_g * (n_g - 1) * u"
                        " as double)) * 1000000) as long)"
                    )
                    - F.expr(
                        "cast(round(ln(cast(a_g * 1000 * (nn - k)"
                        " as double)) * 1000000) as long)"
                    )
                )
            ).alias("cell")
        )
    )
    tnum = cell.groupBy().agg(F.sum("cell").alias("tnum_micro"))
    out = (
        marg.crossJoin(F.broadcast(tnum))
        .crossJoin(F.broadcast(drops))
        .withColumn(
            "c_ppb_raw",
            F.expr(
                "case when k >= 2 and nn > k then"
                " 1000000000 + (h_ppb - 1000000000 div (nn - k))"
                " div (3 * (k - 1)) end"
            ),
        )
    )
    ok = (
        (F.col("k") >= 2)
        & (F.col("a_min") > 0)
        & (F.col("u") > 0)
        & (F.col("nn") > F.col("k"))
        & (F.col("c_ppb_raw") > 0)
    )
    t_milli = F.when(
        ok,
        F.expr(
            "cast(cast(sign(tnum_micro) as long)"
            " * (cast(abs(tnum_micro) as decimal(38,0)) * 1000000"
            " div c_ppb_raw) as long)"
        ),
    )
    dfree = F.col("k") - 1
    withc = out.withColumn("t_milli", t_milli)
    okt = F.col("t_milli").isNotNull()
    return withc.select(
        F.col("nn").alias("n_total"),
        "k",
        "dropped",
        F.when(ok, F.col("tnum_micro")).alias("tnum_micro"),
        F.when(ok, F.col("c_ppb_raw")).alias("c_ppb"),
        "t_milli",
        F.when(okt, dfree).alias("df"),
        F.when(okt, _crit_milli(dfree)).alias("crit_milli"),
        F.when(
            okt & dfree.between(1, 10),
            F.col("t_milli") > _crit_milli(dfree),
        ).alias("sig05"),
        F.when(
            (F.col("k") >= 2) & (F.col("a_min") <= 0),
            F.lit("zero_variance"),
        )
        .when(~ok, F.lit("degenerate"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
