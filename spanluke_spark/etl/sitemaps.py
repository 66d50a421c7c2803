"""Sitemap parsing (sitemaps.org XML protocol) — the discovery side of
the crawl first mile: robots.txt says what we MAY fetch (etl/robots.py),
sitemaps say what the host WANTS fetched, with freshness hints that
drive re-crawl scheduling.

Two document shapes, auto-detected per file:

* urlset: <url><loc>, optional <lastmod>/<changefreq>/<priority> ->
  one frontier row per URL;
* sitemapindex: <sitemap><loc> -> child-sitemap pointers, emitted with
  ``is_index = true`` so the fetch loop can recurse.

Parsing is pure codegen — regexp_extract_all over the raw XML text,
per-entry field extraction with Spark HOFs, zero Python. A sitemap file
is capped at 50 MB / 50k URLs by the protocol, so per-file arrays are
bounded by spec, never by corpus size; 10^8 sitemap files parallelize
as ordinary rows. Entity-unescaping covers the five XML built-ins
(&amp; &lt; &gt; &quot; &apos;) the protocol requires escaping.

Not an XML validator by design (crawl reality is tag soup): entries
without a <loc> are dropped, malformed optional fields yield NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def _unescape(col):
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _field(entry, tag: str):
    v = F.regexp_extract(entry, rf"(?s)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return F.when(v != "", _unescape(v))


def parse_sitemaps(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "xml",
) -> DataFrame:
    """(host, xml) -> (host, is_index, loc, lastmod, changefreq,
    priority): one row per <url> entry (is_index=false) or per <sitemap>
    pointer (is_index=true). Entries lacking <loc> are dropped."""
    entries = sitemaps.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col),
                F.lit(r"(?s)<(url|sitemap)>(.*?)</(?:url|sitemap)>"),
                2,
            )
        ).alias("entry"),
        F.col(xml_col).contains("<sitemapindex").alias("is_index"),
    )
    return entries.select(
        "host",
        "is_index",
        _field(F.col("entry"), "loc").alias("loc"),
        # try_* variants: malformed optional fields must yield NULL, not
        # an ANSI cast error that kills the whole crawl task
        F.try_to_date(
            F.substring(_field(F.col("entry"), "lastmod"), 1, 10)
        ).alias("lastmod"),
        _field(F.col("entry"), "changefreq").alias("changefreq"),
        _field(F.col("entry"), "priority").try_cast("double").alias(
            "priority"
        ),
    ).where(F.col("loc").isNotNull())
