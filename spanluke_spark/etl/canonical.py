"""rel=canonical collapse — the page-author side of URL deduplication.
Crawls see the same document under tracking parameters, mirrors, mobile
hosts, and pagination variants; the ``<link rel="canonical" href=..>``
hint names the ONE URL the site wants indexed. Collapsing to canonical
keys BEFORE content dedup removes the dominant trivial-duplicate mode
at zero shingling cost (the content pipeline then only fights true
near-duplicates), and composes with redirect resolution
(etl/redirects.py) because canonical targets are themselves often
301-redirected.

Extraction is pure codegen (regexp over the html bytes, HOF filter for
the canonical relation, attribute order / quote style insensitive).
href resolution covers the absolute, root-relative (``/path``) and
protocol-relative (``//host/path``) forms; path-relative hrefs with
dot-segments are ambiguous without full RFC 3986 base resolution and
yield NULL (self-canonical), the conservative crawl policy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&apos;", "'"),
    ("&amp;", "&"),
]


def _unescape(col: Column) -> Column:
    out = col
    for ent, ch in _ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return out


def _origin(url: Column) -> Column:
    """scheme://host[:port] of an absolute URL."""
    return F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*://[^/?#]+)", 1)


def _scheme(url: Column) -> Column:
    return F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*):", 1)


def extract_canonical(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (url, canonical_url): the first ``<link rel="canonical">``
    href per page, resolved to an absolute URL against the page's own
    URL; NULL when the page declares none (or only an unresolvable
    path-relative one). First-match-wins mirrors browser/indexer
    behavior for conflicting duplicate declarations."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(r"(?is)(<link\b[^>]*>)"), 1)
    canon = F.filter(
        tags, lambda t: t.rlike(r"""(?is)rel\s*=\s*["']?canonical""")
    )
    first = F.try_element_at(canon, F.lit(1))
    href = _unescape(
        F.regexp_extract(first, r"""(?is)href\s*=\s*["']([^"']*)""", 1)
    )
    url = F.col(url_col)
    resolved = (
        F.when(href == "", F.lit(None).cast("string"))
        .when(href.rlike(r"^[a-z][a-z0-9+.-]*://"), href)
        .when(href.startswith("//"), F.concat(_scheme(url), F.lit(":"), href))
        .when(href.startswith("/"), F.concat(_origin(url), href))
        # path-relative without dot-segments: resolve against the URL's
        # directory; anything with ../ is NULL (see module docstring)
        .when(
            ~href.contains("../") & href.rlike(r"^[^?#]"),
            F.concat(F.regexp_replace(url, r"[^/]*$", ""), href),
        )
    )
    return pages.select(url.alias("url"), resolved.alias("canonical_url"))


def canonicalize_urls(
    pages: DataFrame,
    redirects: DataFrame | None = None,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """pages -> (url, canonical_key, is_canonical): the dedup key each
    page collapses under. canonical_key = the page's rel=canonical
    target when declared (else the URL itself), then chased through the
    resolved redirect map when ``redirects`` (src, dst) is given —
    redirect LOOPS keep the pre-redirect key (a loop has no landing
    page). is_canonical marks pages already at their key, i.e. the
    cluster representatives.

    Shape: one codegen extraction + one left equi-join against the
    (tiny, relative to pages) resolved redirect map — broadcastable by
    AQE; the 10^12-page side never shuffles."""
    keys = extract_canonical(pages, url_col, html_col).select(
        "url", F.coalesce("canonical_url", "url").alias("key0")
    )
    if redirects is not None:
        from spanluke_spark.etl.redirects import resolve_redirects

        finals = resolve_redirects(redirects).where(~F.col("is_cycle")).select(
            F.col("src").alias("_rsrc"), F.col("final").alias("_rfinal")
        )
        keys = keys.join(finals, keys.key0 == finals._rsrc, "left").select(
            "url", F.coalesce("_rfinal", "key0").alias("key0")
        )
    return keys.select(
        "url",
        F.col("key0").alias("canonical_key"),
        (F.col("url") == F.col("key0")).alias("is_canonical"),
    )
