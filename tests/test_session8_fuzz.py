"""Adversarial-input gates for the session-8 parser lanes: random tag
soup, truncated tags, quote imbalance, binary junk, and pathological
attribute orders through parse_feeds / discover_feeds /
extract_canonical / extract_hreflang / extract_metatags — every lane
must process ALL rows without raising (the crawl contract: malformed
input yields NULLs or no rows, never a dead task), deterministically
across two evaluations.
"""

from __future__ import annotations

import numpy as np

from spanluke_spark.etl.canonical import canonicalize_urls, extract_canonical
from spanluke_spark.etl.feeds import discover_feeds, parse_feeds
from spanluke_spark.etl.hreflang import reciprocal_alternates
from spanluke_spark.etl.metatags import extract_metatags

_FRAGMENTS = [
    "<link", ">", '"', "'", "rel=", "canonical", "alternate", "hreflang",
    "href=", "content=", "property=", "og:title", "<meta ", "<item>",
    "</item>", "<entry>", "</entry>", "<pubDate>", "Tue, 99 Zzz 20",
    "<published>", "9999-99-99T99:99:99Z", "&amp;", "&bogus;", "\x00",
    "\ud800" if False else "�", "ÿþ", "<<<>>>", "<link rel=canonical",
    'href="', "http://", "//", "../", "<rss>", "<feed>", "type=",
    "application/rss+xml", "]]>", "<!--", "-->", "<![CDATA[",
]


def _soup(rng, n_rows=150):
    rows = []
    for i in range(n_rows):
        k = rng.integers(1, 25)
        parts = [
            _FRAGMENTS[rng.integers(0, len(_FRAGMENTS))] for _ in range(k)
        ]
        rows.append((f"https://f{i % 7}/x/p{i}", "".join(parts)))
    return rows


def test_fuzz_all_parsers_never_raise(spark):
    rng = np.random.default_rng(8008)
    rows = _soup(rng)
    html_df = spark.createDataFrame(rows, "url string, html string")
    xml_df = spark.createDataFrame(rows, "url string, xml string")

    for df in (
        extract_canonical(html_df),
        canonicalize_urls(html_df),
        reciprocal_alternates(html_df),
        extract_metatags(html_df),
        discover_feeds(html_df),
        parse_feeds(xml_df),
    ):
        first = sorted(map(tuple, df.collect()))
        second = sorted(map(tuple, df.collect()))
        assert first == second  # deterministic under re-evaluation


def test_fuzz_outputs_respect_contracts(spark):
    rng = np.random.default_rng(8009)
    rows = _soup(rng, 200)
    html_df = spark.createDataFrame(rows, "url string, html string")

    # canonical keys are never empty strings and every url keeps a row
    keys = canonicalize_urls(html_df).collect()
    assert len(keys) == len(rows)
    assert all(r.canonical_key for r in keys)

    # discovered feed urls are non-empty and typed
    for r in discover_feeds(html_df).collect():
        assert r.feed_url and r.feed_type in ("rss", "atom")

    # metatag timestamps are either None or real datetimes
    for r in extract_metatags(html_df).collect():
        assert r.published_ts is None or r.published_ts.year >= 1
