"""Internal-consistency reliability: Cronbach's alpha (Cronbach
1951) and the item-rest discrimination panel — do k quality signals
(rater columns, heuristic sub-scores) measure ONE underlying thing,
and which item is the dead weight? The scale-construction companion
of ICC(1,1) (q376, absolute agreement) and Fleiss kappa (q326,
categorical): alpha is what a signal-fusion pipeline checks before
averaging its k sub-scores into one quality number.

Input is LONG format (unit, item, score) with a COMPLETE design
(every unit scores every item — the caller's contract, as in q376).

Alpha exactness: with per-item centered moments A_i = n*Q_i - S_i^2
and the unit-total moments A_tot (same form on the row sums T_u) —
note every A is n^2 x the usual variance, and the scaling cancels:

  alpha = k/(k-1) * (1 - sum A_i / A_tot)
  alpha_milli = sign-split 1000 * k * (A_tot - sum A_i)
                div ((k-1) * A_tot)

exact integers end to end (alpha can be negative; the sign split
keeps Spark div == DuckDB //). A_tot == 0 (constant totals) or
k < 2 surfaces NULL. The parallel-items closed form is EXACT: k
identical items give A_tot = k^2*A, sum A_i = k*A, so alpha == 1000
with no rounding at all (pytest-pinned).

Item-rest discrimination (the q354 signed-square discipline): for
each item, the Pearson r between the item score and the REST total
(unit total minus the item — using the full total inflates r
spuriously), carried as

  r2_ppm = sign(num) * num^2 * 10^6 div (A_item * A_rest),
  num    = n * S_sr - S_s * S_r

num^2 * 10^6 rides DECIMAL(38,0)/HUGEINT; A products stay long under
the stated contract (n * max score <= ~10^5, the q330 bounds). An
item that IS the sum of the others scores exactly 10^6; a reversed
item goes negative; a constant item (A_item == 0) surfaces NULL.

Distributed shape: one unit-totals aggregate joined back (broadcast
when units are bounded; the join key is the unit id either way), one
per-item aggregate, one 1-row totals aggregate — no pivot, k never
appears in the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cronbach_alpha", "item_rest_panel"]


def _with_totals(
    df: DataFrame, unit_col: str, item_col: str, score_col: str
) -> DataFrame:
    s = df.select(
        F.col(unit_col).alias("unit"),
        F.col(item_col).alias("item"),
        F.col(score_col).cast("long").alias("s"),
    )
    totals = s.groupBy("unit").agg(F.sum("s").alias("t"))
    return s.join(totals, "unit")


def cronbach_alpha(
    df: DataFrame,
    unit_col: str = "unit",
    item_col: str = "item",
    score_col: str = "score",
) -> DataFrame:
    """long (unit, item, score) complete design -> ONE row (n_units,
    k_items, sum_item_a, a_tot, alpha_milli)."""
    joined = _with_totals(df, unit_col, item_col, score_col)
    per_item = joined.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").alias("ss"),
        F.sum(F.col("s") * F.col("s")).alias("qs"),
    )
    item_a = per_item.select(
        "n",
        (F.col("n") * F.col("qs") - F.col("ss") * F.col("ss")).alias(
            "a_i"
        ),
    ).groupBy().agg(
        F.max("n").alias("n_units"),
        F.count(F.lit(1)).cast("long").alias("k_items"),
        F.sum("a_i").alias("sum_item_a"),
    )
    tot = (
        joined.groupBy("unit")
        .agg(F.max("t").alias("t"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).cast("long").alias("nu"),
            F.sum("t").alias("st"),
            F.sum(F.col("t") * F.col("t")).alias("qt"),
        )
        .select(
            (F.col("nu") * F.col("qt") - F.col("st") * F.col("st"))
            .alias("a_tot")
        )
    )
    base = item_a.crossJoin(F.broadcast(tot))
    num = F.expr("k_items * (a_tot - sum_item_a)")
    mag = F.expr(
        "abs(k_items * (a_tot - sum_item_a)) * 1000"
        " div ((k_items - 1) * a_tot)"
    )
    return base.select(
        "n_units",
        "k_items",
        "sum_item_a",
        "a_tot",
        F.when(
            (F.col("k_items") >= 2) & (F.col("a_tot") > 0),
            F.when(num < 0, -mag).otherwise(mag),
        ).alias("alpha_milli"),
    )


def item_rest_panel(
    df: DataFrame,
    unit_col: str = "unit",
    item_col: str = "item",
    score_col: str = "score",
) -> DataFrame:
    """long (unit, item, score) -> one row per item (item, n, a_item,
    a_rest, num, r2_ppm): signed-square item-rest correlation."""
    joined = _with_totals(df, unit_col, item_col, score_col).select(
        "item", "s", (F.col("t") - F.col("s")).alias("r")
    )
    per = joined.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("s").alias("ss"),
        F.sum("r").alias("sr"),
        F.sum(F.col("s") * F.col("s")).alias("qs"),
        F.sum(F.col("r") * F.col("r")).alias("qr"),
        F.sum(F.col("s") * F.col("r")).alias("qsr"),
    )
    base = per.select(
        "item",
        "n",
        (F.col("n") * F.col("qs") - F.col("ss") * F.col("ss")).alias(
            "a_item"
        ),
        (F.col("n") * F.col("qr") - F.col("sr") * F.col("sr")).alias(
            "a_rest"
        ),
        (F.col("n") * F.col("qsr") - F.col("ss") * F.col("sr")).alias(
            "num"
        ),
    )
    mag = F.expr(
        "cast(cast(num as decimal(38,0)) * num * 1000000"
        " div (cast(a_item as decimal(38,0)) * a_rest) as long)"
    )
    return base.select(
        "item",
        "n",
        "a_item",
        "a_rest",
        "num",
        F.when(
            (F.col("a_item") > 0) & (F.col("a_rest") > 0),
            F.when(F.col("num") < 0, -mag).otherwise(mag),
        ).alias("r2_ppm"),
    )
