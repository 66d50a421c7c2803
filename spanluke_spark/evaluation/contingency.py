"""Chi-squared independence audit over a contingency of two categorical
columns — the corpus-composition drift test (is language independent of
source? is media type independent of host bucket?) that sits beside the
two-sample lanes (Mann-Whitney q246, KS q267) as the CATEGORICAL member
of the stats family. Pearson (1900) statistic, Cramér (1946) V effect
size, per-cell standardized contributions for the "which cell drives
it" read.

Integer-quantized replay convention (the repo's cross-engine pattern,
cf. PLSA/SimRank): every per-cell contribution
(O*N - r*c)^2 / (N*r*c) is ONE division of values both engines derive
identically, quantized to parts-per-million BIGINT at the cell; the
total chi-squared is then an exact integer SUM — no float-accumulation
order anywhere. (O*N - r*c) is computed in int64 (exact while
N^2 < 2^63) and squared in double (bit-identical single op in Spark and
DuckDB).

Scale shape: two groupBy passes over the corpus (cells, plus row/col
margins derived FROM the cell table — the corpus is scanned once),
then everything downstream runs on the r*c cell table (dozens of
rows); the global window for the total is over cells, never the
corpus. Margins join back via broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["chi_squared_independence"]


def chi_squared_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """-> one row per observed cell: (row_col, col_col, o, row_total,
    col_total, cell_chi2_ppm, chi2_ppm, dof, cramers_v). chi2_ppm is the
    ppm-quantized Pearson statistic (identical on every row), dof =
    (R-1)(C-1) over OBSERVED categories, cramers_v = sqrt(chi2/(N*(min(R,C)-1)))."""
    cells = df.groupBy(row_col, col_col).agg(F.count("*").alias("o"))
    rows = cells.groupBy(row_col).agg(F.sum("o").alias("row_total"))
    cols = cells.groupBy(col_col).agg(F.sum("o").alias("col_total"))
    n = cells.agg(
        F.sum("o").alias("n"),
        F.countDistinct(row_col).alias("nr"),
        F.countDistinct(col_col).alias("nc"),
    )
    t = (
        cells.join(F.broadcast(rows), row_col)
        .join(F.broadcast(cols), col_col)
        .crossJoin(F.broadcast(n))
    )
    dev = (
        F.col("o") * F.col("n") - F.col("row_total") * F.col("col_total")
    ).cast("double")
    contrib = (dev * dev) / (
        F.col("n") * F.col("row_total") * F.col("col_total")
    ).cast("double")
    t = t.withColumn(
        "cell_chi2_ppm", F.round(contrib * 1e6).cast("long")
    )
    w = Window.partitionBy()  # over the r*c cell table only
    t = t.withColumn("chi2_ppm", F.sum("cell_chi2_ppm").over(w))
    dof = ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long")
    v = F.round(
        F.sqrt(
            (F.col("chi2_ppm").cast("double") / 1e6)
            / (
                F.col("n") * (F.least("nr", "nc") - 1)
            ).cast("double")
        ),
        6,
    )
    return t.select(
        row_col,
        col_col,
        "o",
        "row_total",
        "col_total",
        "cell_chi2_ppm",
        "chi2_ppm",
        dof.alias("dof"),
        v.alias("cramers_v"),
    )
