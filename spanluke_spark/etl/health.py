"""Crawl-host health monitoring with Wilson score intervals — the
binomial confidence bound that stays honest at small n (a host with 2/2
failures is NOT certainly broken; a host with 180/200 is certainly
degraded): flag a host only when the UPPER Wilson bound of its success
rate sits below the SLA, i.e. the data rules the SLA out, not just the
point estimate.

One count aggregate per host (map-side combinable), closed-form float
expressions over the exact integer (n, n_ok) pair — bit-identical in
the SQL oracle. This is the statistically-correct upgrade of a naive
`rate < sla` filter for retire/retry decisions on the crawl frontier
(etl/frontier.py) and recrawl scheduling (etl/recrawl.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["host_health_wilson"]


def host_health_wilson(
    df: DataFrame,
    host: Column,
    success: Column,
    z: float = 1.96,
    sla: float = 0.9,
) -> DataFrame:
    """-> (host, n, n_ok, rate, wilson_lo, wilson_hi, breach): per-host
    fetch counts, success rate, Wilson score interval at confidence z,
    and breach = (wilson_hi < sla) — certain SLA violation."""
    agg = df.select(host.alias("host"), success.cast("int").alias("ok")).groupBy(
        "host"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("ok").alias("n_ok"))
    n = F.col("n")
    p = F.col("n_ok") / n
    z2 = z * z
    denom = 1.0 + z2 / n
    center = (p + z2 / (2.0 * n)) / denom
    half = (
        F.lit(z)
        * F.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
        / denom
    )
    lo = F.greatest(center - half, F.lit(0.0))
    hi = F.least(center + half, F.lit(1.0))
    return agg.select(
        "host",
        "n",
        "n_ok",
        F.round(p, 6).alias("rate"),
        F.round(lo, 6).alias("wilson_lo"),
        F.round(hi, 6).alias("wilson_hi"),
        (hi < sla).alias("breach"),
    )
