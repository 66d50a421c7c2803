"""RSS 2.0 / Atom 1.0 feed parsing — the push side of the crawl first
mile: sitemaps enumerate a site (etl/sitemaps.py), feeds announce what
is NEW, so a freshness-driven crawler polls feeds between full walks
and routes <item>/<entry> links straight to the fetch frontier.

Two dialects, auto-detected per document:

* RSS 2.0: <item> entries with <guid>/<title>/<link>text</link>/
  <pubDate> (RFC-822 dates: ``Tue, 5 Mar 2024 08:30:00 +0530``);
* Atom 1.0: <entry> entries with <id>/<title>/<link href=".."/>
  (rel="alternate" preferred over rel="self"/others) and ISO-8601
  <published> (fallback <updated>).

Both timestamp grammars are parsed to UTC with pure codegen — component
regexes, a strpos month map, and make_timestamp minus the numeric zone
offset — no Python, no per-row UDF: feeds arrive ~one per host, so
10^8 of them parallelize as ordinary rows and every field is a
whole-stage-codegen expression. Entity-unescaping covers the five XML
built-ins, matching etl/sitemaps.py.

Not an XML validator by design (crawl reality is tag soup): entries
missing optional fields yield NULL; unparseable dates yield NULL rather
than killing the task (the etl/warc.py salvage discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]

_MONTHS = "JanFebMarAprMayJunJulAugSepOctNovDec"

_RFC822_RE = (
    r"(\d{1,2})\s+(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+"
    r"(\d{4})\s+(\d{2}):(\d{2}):(\d{2})\s*(GMT|UTC?|Z|[+-]\d{4})"
)

_ISO_RE = (
    r"(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})"
    r"(?:\.\d+)?([Zz]|[+-]\d{2}:?\d{2})"
)


def _unescape(col: Column) -> Column:
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _field(entry: Column, tag: str) -> Column:
    v = F.regexp_extract(entry, rf"(?s)<{tag}[^>]*>\s*(.*?)\s*</{tag}>", 1)
    return F.when(v != "", _unescape(v))


def _zone_minutes(zone: Column) -> Column:
    """Zone token -> signed offset minutes: GMT/UT/UTC/Z = 0; numeric
    ``+HHMM`` / ``-HH:MM`` forms parsed positionally."""
    numeric = zone.rlike(r"^[+-]")
    digits = F.regexp_replace(zone, ":", "")
    sign = F.when(F.substring(digits, 1, 1) == "-", F.lit(-1)).otherwise(F.lit(1))
    hh = F.substring(digits, 2, 2).cast("int")
    mm = F.substring(digits, 4, 2).cast("int")
    return F.when(numeric, sign * (hh * 60 + mm)).otherwise(F.lit(0))


def _utc_ts(y: Column, mo: Column, d: Column, h: Column, mi: Column,
            s: Column, zone: Column) -> Column:
    """Components + zone token -> UTC timestamp (session TZ is pinned
    UTC throughout the engine, so make_timestamp is already UTC-naive;
    the zone offset is then subtracted arithmetically)."""
    local = F.make_timestamp(y, mo, d, h, mi, s.cast("decimal(8,6)"))
    return local - F.make_dt_interval(
        F.lit(0), F.lit(0), _zone_minutes(zone), F.lit(0)
    )


def _rfc822_ts(raw: Column) -> Column:
    """RFC-822 date-time (the RSS <pubDate> grammar) -> UTC timestamp;
    NULL when the text does not match."""
    day = F.regexp_extract(raw, _RFC822_RE, 1)
    mon = F.regexp_extract(raw, _RFC822_RE, 2)
    return F.when(
        day != "",
        _utc_ts(
            F.regexp_extract(raw, _RFC822_RE, 3).cast("int"),
            ((F.instr(F.lit(_MONTHS), mon) + 2) / 3).cast("int"),
            day.cast("int"),
            F.regexp_extract(raw, _RFC822_RE, 4).cast("int"),
            F.regexp_extract(raw, _RFC822_RE, 5).cast("int"),
            F.regexp_extract(raw, _RFC822_RE, 6).cast("int"),
            F.regexp_extract(raw, _RFC822_RE, 7),
        ),
    )


def _iso_ts(raw: Column) -> Column:
    """ISO-8601 / RFC-3339 date-time (the Atom grammar) -> UTC
    timestamp; NULL when the text does not match."""
    y = F.regexp_extract(raw, _ISO_RE, 1)
    return F.when(
        y != "",
        _utc_ts(
            y.cast("int"),
            F.regexp_extract(raw, _ISO_RE, 2).cast("int"),
            F.regexp_extract(raw, _ISO_RE, 3).cast("int"),
            F.regexp_extract(raw, _ISO_RE, 4).cast("int"),
            F.regexp_extract(raw, _ISO_RE, 5).cast("int"),
            F.regexp_extract(raw, _ISO_RE, 6).cast("int"),
            F.regexp_extract(raw, _ISO_RE, 7),
        ),
    )


def _atom_link(entry: Column) -> Column:
    """First <link href> preferring rel="alternate" or rel-less links
    (the Atom default) over rel="self"/"enclosure"/etc."""
    links = F.regexp_extract_all(entry, F.lit(r"(?s)(<link\b[^>]*>)"), 1)
    preferred = F.filter(
        links,
        lambda l: l.contains('rel="alternate"') | ~l.contains("rel="),
    )
    # try_: an entry with no <link> at all must yield NULL, not an error
    chosen = F.try_element_at(
        F.when(F.size(preferred) > 0, preferred).otherwise(links), F.lit(1)
    )
    href = F.regexp_extract(chosen, r'href="([^"]*)"', 1)
    return F.when(href != "", _unescape(href))


def discover_feeds(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (url, feed_type, feed_url, feed_title): feed
    autodiscovery — the ``<link rel="alternate" type="application/
    rss+xml|atom+xml" href=...>`` declarations that tell a crawler WHERE
    a site's feeds live (this module's parse side then reads them).
    Root-relative and protocol-relative hrefs resolve against the page
    URL; attribute order / quote style / case insensitive; pages
    without declarations emit nothing (explode drops empty arrays)."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(r"(?is)(<link\b[^>]*>)"), 1)
    hits = F.filter(
        tags,
        lambda t: t.rlike(
            r"""(?is)type\s*=\s*["']application/(rss|atom)\+xml["']"""
        ),
    )
    out = pages.select(
        F.col(url_col).alias("url"), F.explode(hits).alias("tag")
    )
    t = F.col("tag")
    href = _unescape(
        F.regexp_extract(t, r"""(?is)href\s*=\s*["']([^"']+)["']""", 1)
    )
    url = F.col("url")
    origin = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)
    scheme = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*):", 1)
    resolved = (
        F.when(href.rlike(r"^[a-z][a-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(F.regexp_replace(url, r"[^/]*$", ""), href))
    )
    title = F.regexp_extract(t, r"""(?is)title\s*=\s*["']([^"']*)["']""", 1)
    return (
        out.select(
            "url",
            F.when(
                t.rlike(r"(?is)application/atom\+xml"), F.lit("atom")
            ).otherwise(F.lit("rss")).alias("feed_type"),
            resolved.alias("feed_url"),
            F.when(title != "", _unescape(title)).alias("feed_title"),
        )
        .where(F.col("feed_url") != "")
    )


def parse_feeds(
    feeds: DataFrame, url_col: str = "url", xml_col: str = "xml"
) -> DataFrame:
    """(url, xml) -> (url, feed_type, entry_id, entry_title, entry_link,
    published_ts, summary): one row per RSS <item> or Atom <entry>.
    feed_type is 'atom' when the document opens a <feed> element, else
    'rss'. published_ts is UTC; RSS falls back from <pubDate> to
    <dc:date> (ISO), Atom from <published> to <updated>."""
    is_atom = F.col(xml_col).rlike(r"<feed[\s>]")
    entries = feeds.select(
        F.col(url_col).alias("url"),
        F.when(is_atom, F.lit("atom")).otherwise(F.lit("rss")).alias("feed_type"),
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col),
                F.when(
                    is_atom, F.lit(r"(?s)<entry[\s>](.*?)</entry>")
                ).otherwise(F.lit(r"(?s)<item[\s>](.*?)</item>")),
                1,
            )
        ).alias("entry"),
    )
    e = F.col("entry")
    atom = F.col("feed_type") == "atom"
    return entries.select(
        "url",
        "feed_type",
        F.when(atom, _field(e, "id")).otherwise(_field(e, "guid")).alias(
            "entry_id"
        ),
        _field(e, "title").alias("entry_title"),
        F.when(atom, _atom_link(e)).otherwise(_field(e, "link")).alias(
            "entry_link"
        ),
        F.when(
            atom,
            F.coalesce(_iso_ts(_field(e, "published")), _iso_ts(_field(e, "updated"))),
        )
        .otherwise(
            F.coalesce(_rfc822_ts(_field(e, "pubDate")), _iso_ts(_field(e, "dc:date")))
        )
        .alias("published_ts"),
        F.when(atom, _field(e, "summary")).otherwise(
            _field(e, "description")
        ).alias("summary"),
    )
