"""hreflang gates (etl/hreflang.py): tag extraction across attribute
orders/quotes, x-default passthrough, reciprocity validation (the
one-way annotation must die, the confirmed pair must survive), self-row
exclusion, and composition with connected components for cluster ids.
"""

from spanluke_spark.etl.hreflang import extract_hreflang, reciprocal_alternates


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html string")


def _tag(lang, href):
    return f'<link rel="alternate" hreflang="{lang}" href="{href}"/>'


def test_extract_variants(spark):
    html = (
        _tag("en", "https://s/en")
        + "<LINK HREFLANG='de' REL='alternate' HREF='https://s/de'>"
        + _tag("x-default", "https://s/")
        + '<link rel="stylesheet" href="/css">'       # no hreflang: dropped
        + '<link rel="alternate" href="https://s/feed.xml">'  # no hreflang
        + '<link hreflang="fr" rel="other" href="https://s/fr">'  # wrong rel
    )
    got = {(r.hreflang, r.alt_url)
           for r in extract_hreflang(_pages(spark, [("u", html)])).collect()}
    assert got == {("en", "https://s/en"), ("de", "https://s/de"),
                   ("x-default", "https://s/")}


def test_reciprocity(spark):
    a, b, c = "https://s/en", "https://s/de", "https://s/fr"
    rows = [
        # a <-> b confirmed both ways; a -> c unconfirmed (c omits a);
        # every page carries its self-row, which must not appear
        (a, _tag("en", a) + _tag("de", b) + _tag("fr", c)),
        (b, _tag("de", b) + _tag("en", a)),
        (c, _tag("fr", c) + _tag("de", b)),  # c -> b, but b omits c
    ]
    got = {(r.url, r.hreflang, r.alt_url)
           for r in reciprocal_alternates(_pages(spark, rows)).collect()}
    assert got == {(a, "de", b), (b, "en", a)}


def test_duplicate_declarations_collapse(spark):
    a, b = "https://s/a", "https://s/b"
    rows = [
        (a, _tag("zz", b) + _tag("de", b)),  # same target twice: min label
        (b, _tag("en", a)),
    ]
    got = [(r.url, r.hreflang, r.alt_url)
           for r in reciprocal_alternates(_pages(spark, rows)).collect()]
    assert sorted(got) == [(a, "de", b), (b, "en", a)]


def test_clusters_via_connected_components(spark):
    from spanluke_spark.canon.cc import connected_components

    a, b, c, x, y = (f"https://s/{p}" for p in "abcxy")
    rows = [
        (a, _tag("de", b)), (b, _tag("en", a) + _tag("fr", c)),
        (c, _tag("de", b)),
        (x, _tag("hi", y)), (y, _tag("en", x)),
    ]
    from pyspark.sql import functions as F

    # CC runs on long node ids: hash the urls exactly as canonicalization
    # hashes entity keys (xxhash64), keep a lookup to read clusters back
    valid = reciprocal_alternates(_pages(spark, rows))
    edges = valid.select(
        F.xxhash64("url").alias("src"), F.xxhash64("alt_url").alias("dst")
    )
    cc = connected_components(edges)
    lookup = {r.url: r.h for r in
              _pages(spark, rows).select(
                  "url", F.xxhash64("url").alias("h")).collect()}
    comp = {r[0]: r[1] for r in cc.collect()}
    assert comp[lookup[a]] == comp[lookup[b]] == comp[lookup[c]]
    assert comp[lookup[x]] == comp[lookup[y]]
    assert comp[lookup[a]] != comp[lookup[x]]
