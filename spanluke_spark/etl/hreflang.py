"""hreflang alternate clusters — multilingual page equivalence from
``<link rel="alternate" hreflang="xx" href="...">`` annotations. A
language set groups the SAME document in n languages; collapsing a
crawl to one member per set (or routing each language to its own
training mixture) needs the validated set structure, not the raw tags.

The indexing-policy rule this implements: an annotation A -> B counts
only if B annotates A back (reciprocity). Unconfirmed annotations are
the web's most common hreflang error — a migrated page keeps pointing
at a language variant that no longer points back — and trusting them
would chain unrelated documents into one cluster.

Shapes: extraction is scan-side codegen (tag regexp + HOF filter, one
explode); reciprocity is ONE left-semi self-equi-join on the reversed
(url, alt_url) key — never all-pairs. The validated edge set feeds
canon/cc.py connected components for cluster ids, the same CC used by
entity canonicalization (edges there, edges here: one operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TAG_RE = r"(?is)(<link\b[^>]*>)"


def extract_hreflang(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (url, hreflang, alt_url): one row per declared
    rel="alternate" hreflang annotation (attribute order / quote style /
    case insensitive; tags missing either attribute are dropped).
    x-default rows pass through with hreflang = 'x-default'."""
    html_str = F.col(html_col).cast("string")
    tags = F.regexp_extract_all(html_str, F.lit(_TAG_RE), 1)
    alts = F.filter(
        tags,
        lambda t: t.rlike(r"""(?is)rel\s*=\s*["']?alternate""")
        & t.rlike(r"(?is)hreflang\s*="),
    )
    out = pages.select(
        F.col(url_col).alias("url"), F.explode(alts).alias("tag")
    )
    lang = F.regexp_extract(F.col("tag"), r"""(?is)hreflang\s*=\s*["']([^"']+)["']""", 1)
    href = F.regexp_extract(F.col("tag"), r"""(?is)href\s*=\s*["']([^"']+)["']""", 1)
    return (
        out.select(
            "url", lang.alias("hreflang"), href.alias("alt_url")
        )
        .where((F.col("hreflang") != "") & (F.col("alt_url") != ""))
    )


def reciprocal_alternates(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (url, hreflang, alt_url): the VALIDATED alternate edge
    set — an annotation survives only if the target page annotates the
    source back (in any language; the return label need not match).
    Self-references (the recommended self-row) are trivially reciprocal
    and excluded — cluster edges only need the cross links. Duplicate
    declarations collapse to one row with the minimum label
    (deterministic when a page declares one target twice)."""
    e = (
        extract_hreflang(pages, url_col, html_col)
        .groupBy("url", "alt_url")
        .agg(F.min("hreflang").alias("hreflang"))
    )
    rev = e.select(
        F.col("alt_url").alias("url"), F.col("url").alias("alt_url")
    )
    return (
        e.join(rev, ["url", "alt_url"], "left_semi")
        .where(F.col("url") != F.col("alt_url"))
        .select("url", "hreflang", "alt_url")
    )
