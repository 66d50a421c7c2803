"""2-D skyline (Pareto frontier) selection (Börzsönyi et al., ICDE
2001) — the documents no other document beats on BOTH axes at once
(quality vs freshness, length vs LM score): the right shortlist when
two signals matter and any scalarization (weighted sum, q50's single
quality gate) silently buries one of them.

Dominance contract (maximize both axes): d' dominates d iff x' >= x,
y' >= y, strictly better in at least one. Exact ties on both axes
dominate neither way, so duplicate points survive together.

The 2-D case needs NO quadratic dominance join: reduce to one row per
distinct x (max y), take the strictly-greater-x running maximum with a
lag over the x-descending order, and a row is on the skyline iff its y
equals its x-group maximum AND beats that running max. One aggregate +
one window over the DISTINCT-X relation (tiny next to the corpus; for
adversarially high-cardinality x, quantize x first) + one broadcast
join back. The d-dimensional generalization needs the dominance join —
out of scope here, documented rather than hidden.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Input rows + an ``on_skyline`` flag: true iff no other row
    dominates (both axes maximized)."""
    perx = df.groupBy(F.col(x_col).alias("_x")).agg(
        F.max(F.col(y_col)).alias("_my")
    )
    w = (
        Window.orderBy(F.col("_x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    perx = perx.withColumn("_pm", F.max("_my").over(w))
    out = df.join(
        F.broadcast(perx), df[x_col] == perx["_x"]
    ).withColumn(
        "on_skyline",
        (F.col(y_col) == F.col("_my"))
        & (
            F.col("_pm").isNull() | (F.col("_my") > F.col("_pm"))
        ),
    )
    return out.drop("_x", "_my", "_pm")
