"""rel=canonical gates (etl/canonical.py): extraction across attribute
orders/quote styles, href resolution forms, first-match-wins, the
stylesheet-decoy filter, and redirect composition incl. loops.
"""

from spanluke_spark.etl.canonical import canonicalize_urls, extract_canonical


def _extract(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {r.url: r.canonical_url for r in extract_canonical(df).collect()}


def test_extract_forms(spark):
    got = _extract(spark, [
        ("https://a/x/p1", '<link rel="canonical" href="https://a/c1">'),
        ("https://a/x/p2", "<LINK HREF='https://a/c2' REL='canonical'>"),
        ("https://a/x/p3", '<link rel=canonical href="/c3">'),
        ("https://a/x/p4", '<link rel="canonical" href="//b/c4">'),
        ("https://a/x/p5", '<link rel="canonical" href="rel5">'),
        ("https://a/x/p6", '<link rel="canonical" href="../c6">'),
        ("https://a/x/p7", "<p>none</p>"),
        ("https://a/x/p8", '<link rel="stylesheet" href="/s.css">'
                           '<link rel="canonical" href="https://a/c8">'
                           '<link rel="canonical" href="https://a/LATER">'),
        ("https://a/x/p9", '<link rel="canonical" href="https://a/c?x=1&amp;y=2">'),
    ])
    assert got["https://a/x/p1"] == "https://a/c1"
    assert got["https://a/x/p2"] == "https://a/c2"  # case/order insensitive
    assert got["https://a/x/p3"] == "https://a/c3"  # root-relative
    assert got["https://a/x/p4"] == "https://b/c4"  # protocol-relative
    assert got["https://a/x/p5"] == "https://a/x/rel5"  # path-relative
    assert got["https://a/x/p6"] is None  # dot-segment: conservative NULL
    assert got["https://a/x/p7"] is None
    assert got["https://a/x/p8"] == "https://a/c8"  # decoy skipped, first wins
    assert got["https://a/x/p9"] == "https://a/c?x=1&y=2"  # entity unescape


def test_canonicalize_with_redirects_and_loop(spark):
    pages = spark.createDataFrame(
        [
            ("https://a/p1", '<link rel="canonical" href="https://a/c1">'),
            ("https://a/p2", '<link rel="canonical" href="https://a/loop">'),
            ("https://a/c1", "<p>rep</p>"),
            ("https://a/p3", "<p>none</p>"),
        ],
        "url string, html string",
    )
    redirects = spark.createDataFrame(
        [
            ("https://a/c1", "https://a/mid"),
            ("https://a/mid", "https://a/final"),
            ("https://a/loop", "https://a/loop2"),
            ("https://a/loop2", "https://a/loop"),
        ],
        "src string, dst string",
    )
    got = {r.url: (r.canonical_key, r.is_canonical)
           for r in canonicalize_urls(pages, redirects).collect()}
    # 2-hop chain chased; the declaring page AND the old representative
    # both land on the same final key
    assert got["https://a/p1"] == ("https://a/final", False)
    assert got["https://a/c1"] == ("https://a/final", False)
    # redirect loop: keep the pre-redirect canonical key
    assert got["https://a/p2"] == ("https://a/loop", False)
    # no declaration, no redirect: self-canonical representative
    assert got["https://a/p3"] == ("https://a/p3", True)


def test_canonicalize_without_redirects(spark):
    pages = spark.createDataFrame(
        [("https://a/p", '<link rel="canonical" href="https://a/c">'),
         ("https://a/c", "x")],
        "url string, html string",
    )
    got = {r.url: (r.canonical_key, r.is_canonical)
           for r in canonicalize_urls(pages).collect()}
    assert got == {"https://a/p": ("https://a/c", False),
                   "https://a/c": ("https://a/c", True)}


def test_binary_html_column(spark):
    pages = spark.createDataFrame(
        [("https://a/p", bytearray(b'<link rel="canonical" href="https://a/c">'))],
        "url string, html binary",
    )
    got = extract_canonical(pages).collect()
    assert got[0].canonical_url == "https://a/c"
