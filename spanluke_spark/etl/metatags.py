"""Open Graph / Twitter Card / standard <meta> extraction — the page's
self-declared metadata lane. og:title/og:type and
article:published_time are the highest-precision (title, doc-type,
publication-date) signals a crawl has: they beat heuristic extraction
exactly where heuristics fail (pages whose <h1> is a site banner, dates
buried in templates), so KG construction reads them FIRST and falls
back to content heuristics (etl/outline.py, etl/dates.py) when absent.

Pure codegen: one tag sweep (regexp_extract_all), per-property HOF
lookup (first declaration wins, matching crawler behavior on duplicate
tags), entity unescape, ISO-8601 publication time normalized to UTC
with the shared etl/feeds.py parser. Both ``property=`` (Open Graph,
RDFa) and ``name=`` (twitter:*, standard description) attributes are
honored, attribute order / quote style / case insensitive.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .feeds import _iso_ts, _unescape

_META_RE = r"(?is)(<meta\b[^>]*>)"


def _prop_value(tags: Column, prop: str) -> Column:
    """First <meta property=...|name=...> content value for ``prop``."""
    key = prop.replace(":", "\\:")
    hit = F.filter(
        tags,
        lambda t: t.rlike(
            rf"""(?is)(property|name)\s*=\s*["']{key}["']"""
        ),
    )
    first = F.try_element_at(hit, F.lit(1))
    v = F.regexp_extract(
        first, r"""(?is)content\s*=\s*["']([^"']*)["']""", 1
    )
    return F.when(v != "", _unescape(v))


def extract_metatags(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    extra_props: list[str] | None = None,
) -> DataFrame:
    """pages -> (url, og_title, og_type, og_image, description,
    published_ts, twitter_card[, extras...]): the standard metadata
    bundle; description falls back og:description -> name="description",
    published_ts is article:published_time parsed to UTC (NULL when
    absent/malformed). ``extra_props`` adds raw string columns named by
    property with ':' -> '_'."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(_META_RE), 1)
    cols = [
        F.col(url_col).alias("url"),
        _prop_value(tags, "og:title").alias("og_title"),
        _prop_value(tags, "og:type").alias("og_type"),
        _prop_value(tags, "og:image").alias("og_image"),
        F.coalesce(
            _prop_value(tags, "og:description"),
            _prop_value(tags, "description"),
        ).alias("description"),
        _iso_ts(_prop_value(tags, "article:published_time")).alias(
            "published_ts"
        ),
        _prop_value(tags, "twitter:card").alias("twitter_card"),
    ]
    for p in extra_props or []:
        cols.append(_prop_value(tags, p).alias(p.replace(":", "_")))
    return pages.select(*cols)
