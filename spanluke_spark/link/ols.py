"""Exact-arithmetic OLS — multiple linear regression by normal equations
over one distributed Gram pass.

The engine's parametric regression lane (fetch-latency vs page features,
quality-score drift vs crawl depth), the least-squares sibling of the
spectral Gram pass in link/pca.py (q240): the ONLY distributed work is a
single one-row aggregate of the (d+2)·(d+3)/2 pairwise sums over the
augmented vector v = (1, x_1..x_d, y) — every sum is map-side
combinable, no shuffle wider than one row, and the cost is one scan at
any corpus size. The driver then solves the (d+1)×(d+1) normal system
(X'X)β = X'y with exact Fraction arithmetic — d is the feature count
(single digits), so the solve is microseconds and, because the sums are
carried as decimal(38,0) EXACT integers (inputs are integral by
contract: counts, lengths, bucketed scores), β and R² are exact
rationals — bit-reproducible across partitionings and replayable by an
integer-Cramer SQL oracle (q265).

Singular Gram (collinear features, constant column duplicating the
intercept) raises rather than returning a pseudo-inverse pick: a silent
minimum-norm choice would not be replayable.

Scale contract, stated: inputs must be integer-valued (cast upstream —
quantize continuous signals, the repo-wide exactness discipline);
per-row products must fit a 64-bit long (|x|·|y| < 2^63), the decimal
accumulator then holds 38 digits of headroom for the row count.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ols_fit"]


def _solve_fraction(g: list[list[int]], b: list[int]) -> list[Fraction]:
    """Gaussian elimination with exact rationals; raises on singularity."""
    n = len(b)
    a = [[Fraction(g[i][j]) for j in range(n)] + [Fraction(b[i])] for i in range(n)]
    for col in range(n):
        piv = next((r for r in range(col, n) if a[r][col] != 0), None)
        if piv is None:
            raise ValueError("ols_fit: singular normal equations (collinear features)")
        a[col], a[piv] = a[piv], a[col]
        inv = a[col][col]
        a[col] = [v / inv for v in a[col]]
        for r in range(n):
            if r != col and a[r][col] != 0:
                f = a[r][col]
                a[r] = [vr - f * vc for vr, vc in zip(a[r], a[col])]
    return [a[i][n] for i in range(n)]


def ols_fit(df: DataFrame, features: list[str], label: str) -> DataFrame:
    """df with integer-valued feature/label columns -> (term, value)
    rows: one coefficient per term ('intercept', then each feature name)
    plus an 'r2' row. One distributed aggregate, exact driver solve."""
    vec = [F.lit(1).cast("long").alias("_one")] + [
        F.col(c).cast("long").alias(c) for c in features + [label]
    ]
    names = ["_one"] + features + [label]
    proj = df.select(*vec)
    aggs = []
    for i in range(len(names)):
        for j in range(i, len(names)):
            aggs.append(
                F.sum(
                    (F.col(names[i]) * F.col(names[j])).cast("decimal(38,0)")
                ).alias(f"s_{i}_{j}")
            )
    row = proj.agg(*aggs).collect()[0]
    k = len(features) + 1  # intercept + features
    yi = len(names) - 1

    def s(i: int, j: int) -> int:
        i, j = min(i, j), max(i, j)
        v = row[f"s_{i}_{j}"]
        if v is None:
            raise ValueError("ols_fit: empty input")
        return int(v)

    g = [[s(i, j) for j in range(k)] for i in range(k)]
    b = [s(i, yi) for i in range(k)]
    beta = _solve_fraction(g, b)
    n, sy, syy = s(0, 0), s(0, yi), s(yi, yi)
    sse = Fraction(syy) - sum(bi * Fraction(vi) for bi, vi in zip(beta, b))
    sst = Fraction(syy) - Fraction(sy * sy, n)
    r2 = Fraction(0) if sst == 0 else 1 - sse / sst
    terms = ["intercept"] + list(features) + ["r2"]
    vals = [float(x) for x in beta] + [float(r2)]
    spark = df.sparkSession
    return spark.createDataFrame(
        list(zip(terms, vals)), "term string, value double"
    )
