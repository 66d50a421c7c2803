"""Crawl-frontier politeness scheduling — turn a prioritized URL
frontier into per-host fetch slots that respect each host's crawl
delay: the step between "what may/should we fetch" (etl/robots.py,
etl/sitemaps.py) and the WARC fetch loop.

Each host's queue is ranked by (priority desc, url asc — deterministic)
and slot k fetches at offset (k - 1) * crawl_delay seconds, so every
host sees at most one request per delay window no matter how many
executors pull from the frontier. The rank window partitions BY HOST —
the partition is a host's own queue, which is exactly the resource the
politeness constraint serializes, so the "sequential" window is the
semantics, not an accident; hosts schedule in parallel. An optional
``max_per_host`` cap turns the rank into a WindowGroupLimit partial
top-k (each task forwards at most k rows per host), which is how a
10^12-URL frontier against politeness budgets stays shuffle-light.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def politeness_schedule(
    frontier: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    crawl_delay_sec: float = 1.0,
    delay_col: str | None = None,
    max_per_host: int | None = None,
) -> DataFrame:
    """frontier(host, url, priority[, delay]) -> (host, url, priority,
    slot, fetch_offset_sec): per-host fetch order and start offset.
    ``delay_col`` (per-host robots Crawl-delay) overrides the global
    ``crawl_delay_sec`` where non-NULL."""
    w = Window.partitionBy(host_col).orderBy(
        F.desc(priority_col), F.col(url_col)
    )
    delay = (
        F.coalesce(F.col(delay_col), F.lit(float(crawl_delay_sec)))
        if delay_col
        else F.lit(float(crawl_delay_sec))
    )
    out = frontier.withColumn("slot", F.row_number().over(w))
    if max_per_host is not None:
        out = out.where(F.col("slot") <= max_per_host)
    return out.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.col(priority_col).alias("priority"),
        "slot",
        ((F.col("slot") - 1) * delay).alias("fetch_offset_sec"),
    )
