"""Quadratic-kernel Maximum Mean Discrepancy (Gretton et al. 2012)
WITHOUT pair joins — the multivariate two-sample test for embedding
cohorts ("did the embedding distribution drift between crawls?"),
where the univariate lanes (KS q267, Wasserstein q336, PSI q372)
see only one coordinate at a time.

The trick that makes it scale: for the polynomial kernel
k(x, y) = (<x, y> + c)^2, the pairwise kernel sums COLLAPSE onto
second-moment matrices —

  sum_ij (x_i . y_j)^2 = sum_st Mx[s,t] * My[s,t],
  Mx = sum_i x_i x_i^T   (d^2 numbers per group, d small)

so with group coordinate sums Sx, Sy and sizes n, m:

  Kab = <Ma, Mb> + 2c * <Sa, Sb> + |a| * |b| * c^2   (exact ints)
  mmd2 (biased V-statistic, stated) =
        Kxx/n^2 + Kyy/m^2 - 2*Kxy/(n*m)
  mmd2_milli = 1000 * (m^2*Kxx + n^2*Kyy - 2*n*m*Kxy)
               div (n^2 * m^2)                  [DECIMAL/HUGEINT]

Coordinates are once-quantized to integer milli (the q414
discipline); c is given in squared-milli units (10^6 == 1.0). The
IDENTICAL-multiset lane is exact: X == Y makes the cleared numerator
exactly 0 — no rounding at all (pytest-pinned); a planted mean shift
drives it positive; the V-statistic is non-negative by construction
(also pinned, exact). An empty side surfaces NULL.

Distributed shape: one flattened outer-product explode (d^2 terms
per row — d is small and fixed) into ONE (group, s, t) aggregate;
the rest is 4-row algebra. NO pair join anywhere: this is the
at-scale multivariate drift test. Long-bound contract: moment
entries need n * (milli coord)^2 <= ~1e15 and the cleared numerator
rides DECIMAL(38)/HUGEINT (bounded panels per the q330 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mmd_quadratic"]


def mmd_quadratic(
    df: DataFrame,
    dims: int = 8,
    c_milli2: int = 1_000_000,
    group_col: str = "grp",
    vec_col: str = "embedding",
) -> DataFrame:
    """(grp 0/1, embedding array<float>) -> ONE row (n, m, kxx, kyy,
    kxy, mmd2_milli); group 0 is X."""
    rows = df.select(
        (F.col(group_col) == 0).alias("is_x"),
        F.transform(
            F.slice(F.col(vec_col), 1, dims),
            lambda x: F.round(x * 1000).cast("long"),
        ).alias("q"),
    )
    grid = rows.select(
        "is_x",
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(q) - 1), s ->"
                " transform(sequence(0, size(q) - 1), t ->"
                " named_struct('s', s, 't', t, 'p', q[s] * q[t]))))"
            )
        ).alias("e"),
    ).select(
        "is_x",
        F.col("e.s").alias("s"),
        F.col("e.t").alias("t"),
        F.col("e.p").alias("p"),
    )
    moments = grid.groupBy("is_x", "s", "t").agg(
        F.sum("p").alias("mst")
    )
    mdots = (
        moments.alias("a")
        .join(
            moments.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.t") == F.col("b.t")),
        )
        .groupBy()
        .agg(
            F.sum(
                F.when(
                    F.col("a.is_x") & F.col("b.is_x"),
                    F.col("a.mst") * F.col("b.mst"),
                )
            ).alias("mxx"),
            F.sum(
                F.when(
                    ~F.col("a.is_x") & ~F.col("b.is_x"),
                    F.col("a.mst") * F.col("b.mst"),
                )
            ).alias("myy"),
            F.sum(
                F.when(
                    F.col("a.is_x") & ~F.col("b.is_x"),
                    F.col("a.mst") * F.col("b.mst"),
                )
            ).alias("mxy"),
        )
    )
    sums = (
        rows.select("is_x", F.posexplode("q").alias("s", "v"))
        .groupBy("is_x", "s")
        .agg(F.sum("v").alias("sv"))
    )
    sdots = (
        sums.alias("a")
        .join(sums.alias("b"), F.col("a.s") == F.col("b.s"))
        .groupBy()
        .agg(
            F.sum(
                F.when(
                    F.col("a.is_x") & F.col("b.is_x"),
                    F.col("a.sv") * F.col("b.sv"),
                )
            ).alias("sxx"),
            F.sum(
                F.when(
                    ~F.col("a.is_x") & ~F.col("b.is_x"),
                    F.col("a.sv") * F.col("b.sv"),
                )
            ).alias("syy"),
            F.sum(
                F.when(
                    F.col("a.is_x") & ~F.col("b.is_x"),
                    F.col("a.sv") * F.col("b.sv"),
                )
            ).alias("sxy"),
        )
    )
    counts = rows.groupBy().agg(
        F.sum(F.col("is_x").cast("long")).alias("n"),
        F.sum((~F.col("is_x")).cast("long")).alias("m"),
    )
    c = c_milli2
    base = (
        counts.crossJoin(F.broadcast(mdots))
        .crossJoin(F.broadcast(sdots))
        .select(
            "n",
            "m",
            F.expr(f"mxx + 2 * {c} * sxx + n * n * {c} * {c}").alias(
                "kxx"
            ),
            F.expr(f"myy + 2 * {c} * syy + m * m * {c} * {c}").alias(
                "kyy"
            ),
            F.expr(f"mxy + 2 * {c} * sxy + n * m * {c} * {c}").alias(
                "kxy"
            ),
        )
    )
    return base.select(
        "n",
        "m",
        "kxx",
        "kyy",
        "kxy",
        F.when(
            (F.col("n") > 0) & (F.col("m") > 0),
            F.expr(
                "cast(1000 * (cast(m as decimal(38,0)) * m * kxx"
                "             + cast(n as decimal(38,0)) * n * kyy"
                "             - 2 * cast(n as decimal(38,0)) * m * kxy)"
                " div (cast(n as decimal(38,0)) * n * m * m) as long)"
            ),
        ).alias("mmd2_milli"),
    )
