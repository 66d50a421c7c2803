"""robots.txt parsing and crawl-frontier filtering (RFC 9309).

Before a 10^12-page crawl fetches anything it filters the frontier
against per-host robots policies — the first politeness gate of the
Common-Crawl first mile (etl/warc.py is the fetch side; this is the
may-we-fetch side). Everything is relational:

* ``parse_robots``: robots.txt text -> (host, allow, prefix) rules for
  the ``*`` agent. Line classification is pure codegen; group structure
  (a group = consecutive ``User-agent`` lines + the rules that follow,
  per RFC 9309 §2.2.1) falls out of two PER-HOST window functions —
  robots files are capped at 500 KiB by the RFC, so a per-host window
  is bounded by construction, never a global sort.
* ``frontier_decisions``: longest-match decision per URL (RFC 9309
  §2.2.2: most-specific rule wins; on equal length Allow beats
  Disallow; no match = allowed). One equi-join on host (the rules side
  is thousands of times smaller than the frontier; broadcast when it
  fits) + a ``max_by`` over matching rules — no window over the
  frontier.

Empty-value rules (``Disallow:`` with no path = allow everything) are
dropped at parse time per the spec. Agent matching is exact-``*`` only;
product-token longest-match agent selection is a caller concern (pass
the pre-selected agent's group through the same machinery).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, allow: boolean, prefix: string) rules
    from every group whose User-agent set contains ``*``. Comments (#)
    and blank lines ignored; field names case-insensitive."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).select(
        "host",
        "pos",
        # strip comments, then whitespace
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).where(F.col("line") != "")
    field = F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1))
    typed = lines.select(
        "host", "pos", field.alias("field"), value.alias("value")
    ).where(F.col("field").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("field") == "user-agent").cast("int")
    # a UA line opens a NEW group only when the previous directive line
    # was not itself a UA line (consecutive UA lines share one group)
    new_group = (
        (is_ua == 1) & (F.lag(is_ua, 1, 0).over(w) == 0)
    ).cast("int")
    grouped = typed.withColumn(
        "group_id", F.sum(new_group).over(w)
    )
    star_groups = (
        grouped.where((F.col("field") == "user-agent") & (F.col("value") == "*"))
        .select("host", "group_id")
        .distinct()
    )
    return (
        grouped.where(F.col("field").isin("allow", "disallow"))
        .join(star_groups, ["host", "group_id"])
        .where(F.col("value") != "")  # empty value = no rule, per spec
        .select(
            "host",
            (F.col("field") == "allow").alias("allow"),
            F.col("value").alias("prefix"),
        )
        .distinct()
    )


def frontier_decisions(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """frontier (.. url ..) × rules (host, allow, prefix) ->
    (url, host, path, allowed). Longest matching prefix decides; ties go
    to Allow; URLs with no matching rule (or an unlisted host) are
    allowed."""
    from ..textops.urls import host_of, path_of

    u = frontier.select(
        F.col(url_col).alias("url"),
        host_of(F.col(url_col)).alias("host"),
        path_of(F.col(url_col)).alias("path"),
    )
    r = F.broadcast(rules) if broadcast_rules else rules
    # Non-matching rule rows must still reach the aggregate (a host WITH
    # rules where none match the path is allowed, not dropped), so the
    # match predicate lives inside the conditional max, not in a WHERE.
    matched = (
        u.join(r, "host", "left")
        .groupBy("url", "host", "path")
        .agg(
            F.max(
                F.when(
                    F.col("prefix").isNotNull()
                    & F.col("path").startswith(F.col("prefix")),
                    F.struct(
                        F.length("prefix").alias("len"),
                        F.col("allow").cast("int").alias("allow"),
                    ),
                )
            ).alias("_best")
        )
    )
    # no matching rule -> _best is NULL -> allowed
    return matched.select(
        "url",
        "host",
        "path",
        F.coalesce(F.col("_best.allow") == 1, F.lit(True)).alias("allowed"),
    )
