"""Metadata-extraction gates (etl/metatags.py): attribute order/quote
variants, first-declaration-wins, description fallback chain,
published-time UTC normalization, extra_props plumbing, and NULL
discipline for absent/malformed fields.
"""

from datetime import datetime

from spanluke_spark.etl.metatags import extract_metatags


def _row(spark, html, **kw):
    df = spark.createDataFrame([("u", html)], "url string, html string")
    return extract_metatags(df, **kw).collect()[0]


def test_variants_and_first_wins(spark):
    r = _row(
        spark,
        "<meta content='article' property='og:type'/>"
        '<META PROPERTY="og:title" CONTENT="First &amp; Co"/>'
        '<meta property="og:title" content="Second"/>'
        '<meta name="twitter:card" content="summary_large_image">',
    )
    assert r.og_title == "First & Co"
    assert r.og_type == "article"
    assert r.twitter_card == "summary_large_image"
    assert r.og_image is None and r.description is None


def test_description_fallback(spark):
    both = _row(spark,
                '<meta property="og:description" content="og wins"/>'
                '<meta name="description" content="plain"/>')
    assert both.description == "og wins"
    plain = _row(spark, '<meta name="description" content="plain only"/>')
    assert plain.description == "plain only"


def test_published_time_utc(spark):
    r = _row(spark, '<meta property="article:published_time" '
                    'content="2024-03-05T08:30:00+05:30"/>')
    assert r.published_ts == datetime(2024, 3, 5, 3, 0, 0)
    bad = _row(spark, '<meta property="article:published_time" '
                      'content="last tuesday"/>')
    assert bad.published_ts is None


def test_extra_props(spark):
    r = _row(
        spark,
        '<meta property="og:locale" content="en_GB"/>',
        extra_props=["og:locale", "og:site_name"],
    )
    assert r.og_locale == "en_GB"
    assert r.og_site_name is None
