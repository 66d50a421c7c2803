"""Crawl-budget apportionment: split an integer fetch budget across hosts
proportionally to a quality/demand score so the quotas sum EXACTLY to the
budget — Hamilton's largest-remainder method (the apportionment scheme
with no population paradox inside a single allocation, used for exactly
this by crawl schedulers that must hand each fetcher an integer quota).

quota(h) = floor(B * s_h / S) + 1 for the hosts with the largest
fractional remainders (as many as needed to reach B), ties broken by host
id — fully deterministic, replayable in SQL.

Scale note: the only global ordering runs on the HOST AGGREGATE (one row
per host — 10^6-ish), not the page stream (10^12); the per-host score agg
is the usual map-side-combinable groupBy, and the budget total rides in
as a 1-row broadcast crossJoin (the tfidf.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["apportion_budget"]


def apportion_budget(
    scores: DataFrame,
    total_budget: int,
    key: str = "host",
    score_col: str = "score",
) -> DataFrame:
    """(host, score) -> (host, quota): integer quotas summing to
    ``total_budget``. Scores must be non-negative with a positive sum;
    zero-score hosts can still receive a remainder seat only if every
    remainder above theirs is exhausted (standard Hamilton behavior)."""
    tot = scores.agg(F.sum(score_col).alias("_tot"))
    ideal = (
        scores.select(F.col(key).alias("host"), F.col(score_col).alias("score"))
        .crossJoin(F.broadcast(tot))
        .withColumn("ideal", F.lit(total_budget) * F.col("score") / F.col("_tot"))
        .withColumn("base", F.floor("ideal"))
        .withColumn("rem", F.col("ideal") - F.col("base"))
    )
    allocated = ideal.agg(F.sum("base").alias("_alloc"))
    w = Window.orderBy(F.col("rem").desc(), F.col("host"))
    return (
        ideal.crossJoin(F.broadcast(allocated))
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "quota",
            (
                F.col("base")
                + (F.col("_rk") <= F.lit(total_budget) - F.col("_alloc")).cast("long")
            ),
        )
        .select("host", "quota")
    )
