"""HTML5 microdata (itemscope/itemtype/itemprop) extraction — the second
of the three Web Data Commons markup lanes (with JSON-LD in etl/jsonld.py
and tables in etl/webtables.py). Schema.org-via-microdata predates JSON-LD
and still carries a large share of product/article/person markup in real
crawls (Meusel et al. 2014).

Flat-scope model (documented simplification, same one WDC's quad
extraction applies to non-nested items): the page is SPLIT at every
itemscope-opening tag — a lookahead split, so each fragment starts with
its scope tag — and every itemprop inside a fragment belongs to that
fragment's item. Nested itemscopes therefore start their OWN item (the
child's props attach to the child, which is correct) but the child-item
link to its parent (the itemprop on the scope tag itself) is emitted with
the CHILD's node id as value, preserving the connection.

Value rules (schema.org microdata spec): <meta itemprop> reads @content;
<a>/<link itemprop> read @href; everything else reads the element's text
up to the next tag. Pure codegen throughout — regexp split + extract_all,
zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["microdata_items"]

_SCOPE_SPLIT = r"(?i)(?=<[^>]*\sitemscope)"
_ITEMTYPE_RE = r"""(?is)^<[^>]*\sitemtype\s*=\s*["']([^"']*)["']"""
# one regex per value rule; itemprop name captured alongside
_META_RE = (
    r"""(?is)<meta[^>]*\sitemprop\s*=\s*["']([^"']*)["'][^>]*"""
    r"""\scontent\s*=\s*["']([^"']*)["'][^>]*>"""
)
_HREF_RE = (
    r"""(?is)<(?:a|link)[^>]*\sitemprop\s*=\s*["']([^"']*)["'][^>]*"""
    r"""\shref\s*=\s*["']([^"']*)["'][^>]*>"""
)
_TEXT_RE = (
    r"""(?is)<(?!meta|a\s|link)[a-z0-9]+[^>]*\sitemprop\s*=\s*["']([^"']*)["']"""
    r"""[^>]*>([^<]*)"""
)


def _props(frag: Column, regex: str) -> Column:
    """array<struct<prop,value>> for one value rule."""
    names = F.regexp_extract_all(frag, F.lit(regex), 1)
    values = F.regexp_extract_all(frag, F.lit(regex), 2)
    return F.zip_with(
        names, values, lambda n, v: F.struct(n.alias("prop"), v.alias("value"))
    )


def microdata_items(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, item_idx, item_type, prop, value): every itemprop of every
    itemscope on every page. item_idx is the 0-based scope order within
    the page (fragment order == document order, so it is re-crawl-stable);
    item_type is NULL when the scope tag carries no itemtype."""
    frags = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(F.split(F.col(html_col), _SCOPE_SPLIT)).alias("frag_idx", "frag"),
    ).where(F.col("frag").rlike(r"(?i)^<[^>]*\sitemscope"))

    # fragment order is document order; renumber 0..k-1 per page via the
    # original split position (frag_idx 0 is the pre-scope prefix when the
    # page doesn't START with a scope tag, hence the rlike filter above)
    items = frags.select(
        "url",
        F.col("frag_idx"),
        F.regexp_extract(F.col("frag"), _ITEMTYPE_RE, 1).alias("raw_type"),
        F.concat(
            _props(F.col("frag"), _META_RE),
            _props(F.col("frag"), _HREF_RE),
            _props(F.col("frag"), _TEXT_RE),
        ).alias("props"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("url").orderBy("frag_idx")
    return (
        items.withColumn("item_idx", F.row_number().over(w) - 1)
        .select(
            "url",
            "item_idx",
            F.when(F.col("raw_type") != "", F.col("raw_type")).alias("item_type"),
            F.explode("props").alias("p"),
        )
        .select(
            "url",
            "item_idx",
            "item_type",
            F.col("p.prop").alias("prop"),
            F.trim(F.regexp_replace(F.col("p.value"), r"\s+", " ")).alias("value"),
        )
    )
