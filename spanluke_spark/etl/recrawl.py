"""Recrawl scheduling from observed change history (Cho & Garcia-Molina
2003, "Effective Page Refresh Policies for Web Crawlers"; the estimator in
§4 of "Estimating Frequency of Change"): a crawler that re-fetches every
page equally often wastes most of its budget — estimate each page's Poisson
change rate λ from its capture digests and derive a per-page refresh
interval.

Estimator: over n_int = (captures - 1) adjacent capture pairs, X = pairs
whose digest changed. The naive X/n underestimates (changes between visits
can cancel); the MLE under Poisson changes with regular visit spacing Δ is
``λ̂ = -ln(1 - X/n) / Δ``. X = n gives ln(0): the standard fix caps the
change ratio at (n - 0.5)/n (a change in EVERY interval only bounds λ from
below). Pages with one capture get NULL rate (no evidence).

Scale shape: one window keyed on the url (partition size = that url's
capture count, never global), one groupBy url — both map-side-combinable
after the lag. Pure codegen; at 10^12 captures this is exactly the
cc-index shape (etl.cdx) with a lag over (surt_key, ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["change_rate"]


def change_rate(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts",
    digest_col: str = "digest",
) -> DataFrame:
    """-> (url, n_obs, n_changes, lambda_hat, recrawl_interval): per-page
    Poisson change-rate estimate and its reciprocal (both rounded 1e-6;
    ts is numeric — days, hours, whatever unit the caller uses — and the
    outputs are per that unit)."""
    w = Window.partitionBy(url_col).orderBy(ts_col)
    seq = captures.select(
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("ts"),
        F.col(digest_col).alias("digest"),
    ).withColumn("prev_digest", F.lag("digest").over(w))

    agg = seq.groupBy("url").agg(
        F.count("*").alias("n_obs"),
        F.sum(
            (F.col("prev_digest").isNotNull()
             & (F.col("digest") != F.col("prev_digest"))).cast("long")
        ).alias("n_changes"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )

    n_int = (F.col("n_obs") - 1).cast("double")
    delta = (F.col("ts_max") - F.col("ts_min")).cast("double") / n_int
    ratio = F.least(
        F.col("n_changes").cast("double") / n_int, (n_int - 0.5) / n_int
    )
    # + 0.0 turns IEEE -0.0 (the never-changed page: -ln(1)) into +0.0
    lam = F.when(
        (F.col("n_obs") > 1) & (delta > 0),
        -F.log(F.lit(1.0) - ratio) / delta + 0.0,
    )
    return agg.select(
        "url",
        "n_obs",
        "n_changes",
        F.round(lam, 6).alias("lambda_hat"),
        F.round(
            F.when(lam > 0, 1.0 / lam), 6
        ).alias("recrawl_interval"),
    )
