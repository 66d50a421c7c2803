"""Kaplan-Meier survival estimation (Kaplan & Meier 1958) over page /
URL lifetimes with RIGHT-CENSORING — how long does a page stay alive,
per host cohort, when the crawl stopped watching some pages before they
died? Recrawl scheduling (etl/recrawl.py) needs exactly this curve, and
naive averages are wrong the moment censoring exists (a page alive at
the last crawl is not a death at that age — dropping or counting it
both bias the estimate; the product-limit estimator is the fix).

S(t) = prod over event times t_i <= t of (1 - d_i / n_i), with d_i the
deaths at t_i and n_i the number still at risk (duration >= t_i).
Relational lowering: one (cohort, t) aggregate for deaths/censored, the
risk set as a DESCENDING cumulative sum over t (everything with
duration >= t), and the running product as exp of a cumulative log sum
— with the d_i = n_i collapse handled by an explicit zero branch,
because Spark's ln(0) is NULL while IEEE says -inf (engine-portability
pinned by the oracle). Two stacked windows over one cohort
partitioning: a single shuffle after the count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kaplan_meier"]


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
    cohort_col: str | None = None,
) -> DataFrame:
    """df(duration, event 1/0[, cohort]) -> one row per observed
    duration per cohort: (cohort?, t, n_risk, deaths, censored,
    survival). Censor-only times carry the unchanged survival (factor
    1); survival hits exactly 0 when the last risk set dies whole."""
    cohort = [cohort_col] if cohort_col else []
    agg = (
        df.groupBy(*cohort, F.col(duration_col).alias("t"))
        .agg(
            F.sum(F.col(event_col).cast("long")).alias("deaths"),
            F.sum(
                (F.lit(1) - F.col(event_col).cast("long"))
            ).alias("censored"),
        )
    )
    part = cohort if cohort else [F.lit(1)]
    w_desc = (
        Window.partitionBy(*part)
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy(*part)
        .orderBy(F.col("t").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_risk = F.sum(F.col("deaths") + F.col("censored")).over(w_desc)
    with_n = agg.withColumn("n_risk", n_risk).withColumn(
        "_f", F.lit(1.0) - F.col("deaths") / F.col("n_risk")
    )
    survival = F.when(F.min("_f").over(w_asc) <= F.lit(0.0), F.lit(0.0)).otherwise(
        F.exp(
            F.sum(
                F.when(F.col("_f") > 0, F.log(F.col("_f")))
            ).over(w_asc)
        )
    )
    return with_n.select(
        *cohort,
        "t",
        "n_risk",
        "deaths",
        "censored",
        F.round(survival, 6).alias("survival"),
    )
