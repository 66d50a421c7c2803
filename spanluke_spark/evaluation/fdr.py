"""Multiple-testing control for fleet-wide quality audits: exact
one-sided binomial tail tests per group + the Benjamini-Hochberg
step-up (Benjamini & Hochberg 1995) — the statistically honest way to
flag "hosts whose failure rate exceeds 1/2" across thousands of
simultaneous hypotheses without drowning in false discoveries.

All arithmetic exact-integer:

  p_i   = P(X >= x_i | n_i, 1/2) = (sum_{j>=x_i} C(n_i, j)) / 2^{n_i}
          — the full Pascal row is built by an n_i-step HOF fold
          (exact longs; n_i <= 40 keeps C(n,j) and 2^n in range),
          so the p-value is the exact dyadic rational
          (p_num, p_den = 2^n).
  p_s   = p_num << (NMAX - n_i) — every p-value rescaled to the
          common denominator 2^NMAX: an exact integer SORT key.
  BH    : with ranks i over p ascending (ties by group id), reject
          ranks <= k* = max{ i : p_i <= i·alpha/m }, decided by the
          exact cross-multiplication
              p_num · alpha_den · m  <=  i · alpha_num · p_den.
  q_i   = suffix-min over ranks j >= i of (m · p_ppm_j) div j, where
          p_ppm_j = (p_num · 10^6) div p_den is the ONCE-quantized
          trunc-ppm p-value — the BH-adjusted q-value on the stated
          quantize-then-min contract (the reject decision itself never
          quantizes; suffix min includes rank m where the term is
          p_ppm_m <= 10^6, so q <= 1 holds by construction).

Distributed shape: one groupBy to per-group (n, x), a per-row fold for
the Pascal tail, and rank windows over the HYPOTHESIS table — which is
model-sized (one row per host/group), not corpus-sized; the corpus
axis reduces fully map-side. Overflow discipline: p_num <= 2^40, so
p_num · 10^6 < 2^60 and the BH inequality term
p_num · alpha_den · m stays under 2^63 whenever
m · alpha_den < 2^22 (~4.2e6) — ample for any real hypothesis table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bh_fdr", "binom_tail_pvalues", "by_fdr"]

NMAX = 40


def binom_tail_pvalues(
    trials: DataFrame,
    group_col: str = "grp",
    fail_col: str = "fail",
) -> DataFrame:
    """(grp, fail: boolean) rows -> per grp: (grp, n, x, p_num, p_den,
    p_s) — the exact dyadic one-sided tail P(X >= x | n, 1/2) with the
    common-denominator sort key p_s. Shared by the BH step-up here and
    the Holm step-down (evaluation/holm.py). Trial counts <= 40."""
    agg = trials.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("int").alias("n"),
        F.sum(F.col(fail_col).cast("int")).cast("int").alias("x"),
    )

    # Pascal row for n via fold: row_t = [C(t,0..t)], t = 0..n
    pascal = F.aggregate(
        F.sequence(F.lit(1), F.col("n")),
        F.array(F.lit(1).cast("long")),
        lambda row, _: F.concat(
            F.array(F.lit(1).cast("long")),
            F.zip_with(
                F.slice(row, 1, F.size(row) - 1),
                F.slice(row, 2, F.size(row) - 1),
                lambda a, b: a + b,
            ),
            F.array(F.lit(1).cast("long")),
        ),
    )
    # tail sum: slots x+1 .. n+1 (slot j+1 holds C(n, j))
    p = agg.select(
        "grp",
        "n",
        "x",
        F.aggregate(
            F.slice(pascal, F.col("x") + 1, F.col("n") - F.col("x") + 1),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        ).alias("p_num"),
        F.expr("shiftleft(cast(1 as bigint), n)").alias("p_den"),
    ).withColumn(
        "p_s",
        F.expr(f"shiftleft(p_num, {NMAX} - n)"),
    )
    return p


def bh_fdr(
    trials: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 10,
    group_col: str = "grp",
    fail_col: str = "fail",
) -> DataFrame:
    """(grp, fail: boolean) rows -> per grp: (grp, n, x, p_num, p_den,
    rank, reject, qval_ppm). Requires per-group trial counts <= 40."""
    p = binom_tail_pvalues(trials, group_col, fail_col)

    w = Window.orderBy("p_s", "grp")
    m = Window.partitionBy()
    ranked = p.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(m).alias("m"),
    )
    # exact BH inequality per rank, then k* = max passing rank
    cond = (
        F.col("p_num") * F.lit(alpha_den) * F.col("m")
        <= F.col("rank") * F.lit(alpha_num) * F.col("p_den")
    )
    ranked = ranked.withColumn(
        "kstar",
        F.max(F.when(cond, F.col("rank")).otherwise(F.lit(0))).over(m),
    )
    suffix = Window.orderBy("p_s", "grp").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return ranked.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        "p_num",
        "p_den",
        F.col("rank").cast("long").alias("rank"),
        (F.col("rank") <= F.col("kstar")).alias("reject"),
        F.min(
            F.expr("m * (p_num * 1000000 div p_den) div rank")
        ).over(suffix).alias("qval_ppm"),
    )


def by_fdr(
    trials: DataFrame,
    alpha_num: int = 1,
    alpha_den: int = 10,
    group_col: str = "grp",
    fail_col: str = "fail",
) -> DataFrame:
    """Benjamini-Yekutieli FDR (Benjamini & Yekutieli 2001) — the
    arbitrary-dependence-safe sibling of ``bh_fdr``: same ranked
    inequality shrunk by the harmonic number H_m = sum_{j<=m} 1/j,
    which is exactly the price of not assuming independence across
    the hypothesis table (correlated per-host tests are the NORM in
    a crawl, so BY is the defensible default).

    Harmonic exactness (stated convention): H rides the ONCE-
    QUANTIZED micro cell sum h_micro = sum over ranks j of
    (10^6 div j) — an exact integer both engines compute from the
    same rank column (a floor-cell harmonic, deterministic, within
    m/10^6 of the real H_m). The reject inequality clears to one
    wide-integer comparison (DECIMAL(38)/HUGEINT — p_num alone may
    reach 2^40):

      p_num * alpha_den * m * h_micro
          <= rank * alpha_num * p_den * 10^6

    and q-values are the BH suffix-min with the same h_micro factor,
    capped at 10^6. BY rejects a SUBSET of BH's rejections on the
    same table (pytest-pinned), coinciding at m = 1 (H_1 == 1).

    -> per grp: (grp, n, x, p_num, p_den, rank, reject, qval_ppm),
    the ``bh_fdr`` contract with the BY inequality."""
    p = binom_tail_pvalues(trials, group_col, fail_col)
    w = Window.orderBy("p_s", "grp")
    m = Window.partitionBy()
    ranked = p.select(
        "*",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(m).alias("m"),
    )
    ranked = ranked.withColumn(
        "h_micro",
        F.sum(F.expr("1000000 div rank")).over(m),
    )
    cond = F.expr(
        "cast(p_num as decimal(38,0)) * {ad} * m * h_micro"
        " <= cast(rank as decimal(38,0)) * {an} * p_den * 1000000"
    .format(ad=alpha_den, an=alpha_num))
    ranked = ranked.withColumn(
        "kstar",
        F.max(F.when(cond, F.col("rank")).otherwise(F.lit(0))).over(m),
    )
    suffix = Window.orderBy("p_s", "grp").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    term = F.expr(
        "least(cast(m as decimal(38,0)) * h_micro"
        " * (p_num * 1000000 div p_den)"
        " div (cast(rank as decimal(38,0)) * 1000000),"
        " cast(1000000 as decimal(38,0)))"
    ).cast("long")
    return ranked.select(
        "grp",
        F.col("n").cast("long").alias("n"),
        F.col("x").cast("long").alias("x"),
        "p_num",
        "p_den",
        F.col("rank").cast("long").alias("rank"),
        (F.col("rank") <= F.col("kstar")).alias("reject"),
        F.min(term).over(suffix).alias("qval_ppm"),
    )
