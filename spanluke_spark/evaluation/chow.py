"""Chow structural-break test (Chow 1960) for simple linear
regression: did the relationship y ~ x CHANGE between two segments
(before/after a crawler release, two mirror cohorts)? The
REGRESSION-based break detector beside the rank-based Pettitt scan
(q386): Pettitt finds a level shift with no model; Chow asks whether
a fitted line's (intercept, slope) differ across a KNOWN split.

  F = ((RSS_p - RSS_1 - RSS_2) / k) / ((RSS_1 + RSS_2) / (n - 2k)),
  k = 2 parameters per line

Exactness: each segment's residual sum of squares is one closed-form
rational on centered cross moments A = n*Sxx - Sx^2,
B = n*Syy - Sy^2, C = n*Sxy - Sx*Sy:

  RSS = (A*B - C^2) / (n*A)      (A > 0 required; exact integers)

and F clears onto one rational by telescoping the three denominators:
with RSS_p = Pn/Pd, RSS_1 = Qn/Qd, RSS_2 = Rn/Rd,

  f_milli = 1000 * (n - 4) * (Pn*Qd*Rd - Qn*Pd*Rd - Rn*Pd*Qd)
            div (2 * Pd * (Qn*Rd + Rn*Qd))

The triple products run to ~10^34 — far past int64 — so the clearing
rides DECIMAL(38,0) in Spark and HUGEINT in DuckDB end to end; the
quotient is small. Long-bound contract, stated: n <= ~120 total with
|x|, |y| <= ~20 keeps every product under 38 digits (bounded
evaluation slices, the q330 contract; quantize upstream).

Status lanes instead of silent division: 'ok' (F defined),
'perfect_fit' (both segment fits exact — F is 0/0 or infinite;
includes the two-exact-lines break, pytest-pinned), 'degenerate'
(any A <= 0: a segment with < 3 points or constant x). RSS itself
also ships per segment as rss*_milli for dashboards.

Distributed shape: ONE groupBy("seg") moments aggregate (map-side
combinable); the pooled moments are the SUMS of the segment moments
(all five are additive), so no second scan — everything after the
agg is a 2-row pivot in one select.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chow_test"]


def chow_test(
    df: DataFrame,
    seg_col: str = "seg",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(seg in {1, 2}, x int, y int) -> ONE row (n1, n2, rss1_milli,
    rss2_milli, rssp_milli, f_milli, status)."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    per = df.groupBy(F.col(seg_col).alias("seg")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
    )
    one = per.groupBy().agg(
        F.sum(F.when(F.col("seg") == 1, F.col("n"))).alias("n1"),
        F.sum(F.when(F.col("seg") == 1, F.col("sx"))).alias("sx1"),
        F.sum(F.when(F.col("seg") == 1, F.col("sy"))).alias("sy1"),
        F.sum(F.when(F.col("seg") == 1, F.col("sxx"))).alias("sxx1"),
        F.sum(F.when(F.col("seg") == 1, F.col("sxy"))).alias("sxy1"),
        F.sum(F.when(F.col("seg") == 1, F.col("syy"))).alias("syy1"),
        F.sum(F.when(F.col("seg") == 2, F.col("n"))).alias("n2"),
        F.sum(F.when(F.col("seg") == 2, F.col("sx"))).alias("sx2"),
        F.sum(F.when(F.col("seg") == 2, F.col("sy"))).alias("sy2"),
        F.sum(F.when(F.col("seg") == 2, F.col("sxx"))).alias("sxx2"),
        F.sum(F.when(F.col("seg") == 2, F.col("sxy"))).alias("sxy2"),
        F.sum(F.when(F.col("seg") == 2, F.col("syy"))).alias("syy2"),
    )

    def rss(n, sx, sy, sxx, sxy, syy, num, den):
        return (
            f"(({n} * {sxx} - {sx} * {sx})"
            f" * ({n} * {syy} - {sy} * {sy})"
            f" - ({n} * {sxy} - {sx} * {sy})"
            f" * ({n} * {sxy} - {sx} * {sy})) AS {num}",
            f"({n} * ({n} * {sxx} - {sx} * {sx})) AS {den}",
        )

    exprs = []
    for tag, cols in (
        ("q", ("n1", "sx1", "sy1", "sxx1", "sxy1", "syy1")),
        ("r", ("n2", "sx2", "sy2", "sxx2", "sxy2", "syy2")),
    ):
        nm, dn = rss(*cols, num=f"{tag}n", den=f"{tag}d")
        exprs += [nm, dn]
    pooled = {
        "n": "(n1 + n2)",
        "sx": "(sx1 + sx2)",
        "sy": "(sy1 + sy2)",
        "sxx": "(sxx1 + sxx2)",
        "sxy": "(sxy1 + sxy2)",
        "syy": "(syy1 + syy2)",
    }
    pn, pd = rss(
        pooled["n"],
        pooled["sx"],
        pooled["sy"],
        pooled["sxx"],
        pooled["sxy"],
        pooled["syy"],
        num="pn",
        den="pd",
    )
    exprs += [pn, pd]
    # qn/qd/rn/rd/pn/pd stay inside int64 under the stated contract;
    # only the F clearing (triple products) needs the decimal stage
    base = one.selectExpr("n1", "n2", *exprs)
    st = (
        F.when(
            (F.col("n1").isNull())
            | (F.col("n2").isNull())
            | (F.col("qd") <= 0)
            | (F.col("rd") <= 0)
            | (F.col("pd") <= 0),
            F.lit("degenerate"),
        )
        .when(
            # rss1 == rss2 == 0 <=> qn == 0 and rn == 0 (dens > 0);
            # stated this way to stay inside int64
            (F.col("qn") == 0) & (F.col("rn") == 0),
            F.lit("perfect_fit"),
        )
        .otherwise(F.lit("ok"))
    )
    f_milli = F.expr(
        "cast(1000 * (n1 + n2 - 4)"
        " * (cast(pn as decimal(38,0)) * qd * rd"
        "    - cast(qn as decimal(38,0)) * pd * rd"
        "    - cast(rn as decimal(38,0)) * pd * qd)"
        " div (2 * cast(pd as decimal(38,0))"
        "      * (cast(qn as decimal(38,0)) * rd"
        "         + cast(rn as decimal(38,0)) * qd)) as long)"
    )

    def milli(num, den):
        return F.expr(f"cast(1000 * {num} div {den} as long)")

    return base.select(
        "n1",
        "n2",
        F.when(F.col("qd") > 0, milli("qn", "qd")).alias("rss1_milli"),
        F.when(F.col("rd") > 0, milli("rn", "rd")).alias("rss2_milli"),
        F.when(F.col("pd") > 0, milli("pn", "pd")).alias("rssp_milli"),
        st.alias("status"),
        F.when(st == "ok", f_milli).alias("f_milli"),
    )
