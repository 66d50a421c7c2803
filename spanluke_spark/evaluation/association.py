"""Categorical-association measures: Gini-impurity split gain
(Breiman et al. 1984, the CART criterion) and Cramér's V (Cramér
1946) — "how much does one categorical page attribute explain
another?" The chi-squared lane (q281) answers IS there association;
these answer HOW MUCH, in the two standard normalizations: decision-
tree purity gain (does `source` predict the quality bucket well
enough to split on?) and the [0,1] effect size V.

Gini split gain — log-free exact rationals with ONE once-quantized
cell per child (the q346 discipline):

  parent_ppm = 10^6 (N^2 - sum_c n_c^2) div N^2
  child cell = 10^6 (N_v^2 - sum_c n_vc^2) div (N_v * N)
  gain_ppm   = parent_ppm - sum_v cell_v

A feature that determines the class zeroes every child cell (gain ==
parent exactly); a feature whose children all replicate the parent
proportions gives gain exactly 0 when the counts divide evenly —
both pinned by pytest.

Cramér's V — squared, sqrt-free (the q311/q354 discipline), from
once-quantized per-cell chi-squared milli cells on the identity
(O - E)^2/E = (N*o - r*c)^2 / (N*r*c):

  cell_milli = 1000 (N*o_ij - r_i*c_j)^2 div (N * r_i * c_j)
  v2_ppm     = chi2_milli * 1000 div (N * (min(r,c) - 1))

(summed over the FULL r x c grid including zero cells, built by a
row-margin x column-margin cross of the two bounded margin sets). A
k x k identity table with k^2 | 1000*N gives v2 exactly 10^6; an
independence grid gives exactly 0; transposing the table changes
nothing — all pinned. min(r,c) = 1 surfaces NULL.

Distributed shape: both are groupBy-count pyramids over (feature,
class) with broadcast margins; the only fan-out is margins x margins
(bounded category sets). No windows, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gini_split_gain", "cramers_v"]


def gini_split_gain(
    rows: DataFrame,
    feature_col: str = "feature",
    label_col: str = "label",
) -> DataFrame:
    """(feature, label) -> ONE row (n, n_values, parent_ppm,
    child_ppm, gain_ppm)."""
    s = rows.select(
        F.col(feature_col).cast("string").alias("v"),
        F.col(label_col).cast("string").alias("c"),
    )
    vc = s.groupBy("v", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_vc")
    )
    per_v = vc.groupBy("v").agg(
        F.sum("n_vc").alias("n_v"),
        F.sum(F.col("n_vc") * F.col("n_vc")).alias("s2_v"),
    )
    per_c = s.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("n_c")
    )
    parent = per_c.groupBy().agg(
        F.sum("n_c").alias("n"),
        F.sum(F.col("n_c") * F.col("n_c")).alias("s2"),
    )
    cells = per_v.crossJoin(F.broadcast(parent)).select(
        F.expr(
            "1000000 * (n_v * n_v - s2_v) div (n_v * n)"
        ).alias("cell")
    )
    child = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_values"),
        F.coalesce(F.sum("cell"), F.lit(0).cast("long")).alias(
            "child_ppm"
        ),
    )
    x = parent.crossJoin(F.broadcast(child)).select(
        "n",
        "n_values",
        F.expr("1000000 * (n * n - s2) div (n * n)").alias(
            "parent_ppm"
        ),
        "child_ppm",
    )
    return x.select(
        "*", (F.col("parent_ppm") - F.col("child_ppm")).alias("gain_ppm")
    )


def cramers_v(
    rows: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(a, b) categorical pair -> ONE row (n, r, c, chi2_milli,
    v2_ppm); min(r, c) < 2 -> NULL v2."""
    s = rows.select(
        F.col(a_col).cast("string").alias("i"),
        F.col(b_col).cast("string").alias("j"),
    )
    obs = s.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    rm = s.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("ri"))
    cm = s.groupBy("j").agg(F.count(F.lit(1)).cast("long").alias("cj"))
    tot = s.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    grid = (
        rm.crossJoin(cm)
        .join(obs, ["i", "j"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "ri",
            "cj",
            F.coalesce(F.col("o"), F.lit(0).cast("long")).alias("o"),
        )
    )
    cells = grid.select(
        "n",
        F.expr(
            "1000 * (n * o - ri * cj) * (n * o - ri * cj)"
            " div (n * ri * cj)"
        ).alias("cell_milli"),
    )
    dims = rm.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("r")
    ).crossJoin(
        cm.groupBy().agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    agg = cells.groupBy().agg(
        F.max("n").alias("n"),
        F.sum("cell_milli").alias("chi2_milli"),
    ).crossJoin(F.broadcast(dims))
    v2 = F.when(
        F.least("r", "c") >= 2,
        F.expr("chi2_milli * 1000 div (n * (least(r, c) - 1))"),
    )
    return agg.select("n", "r", "c", "chi2_milli", v2.alias("v2_ppm"))
