"""Web-graph extraction from the pages table: href targets out of raw HTML.

Pure codegen (`regexp_extract_all` over the decoded binary) — at 10^12 pages
the link explode happens after column pruning, so only (url, target) pairs
flow into the graph builders (pagerank.py, canon/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]+)"'
ANCHOR_RE = r'<a href="([^"]*)"[^>]*>([^<]*)</a>'


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (src, dst): one row per <a href> occurrence, in document
    order. Self-links and duplicates are preserved (PageRank weights
    parallel edges); dedupe downstream if the consumer wants a simple graph.
    """
    html_str = F.col(html_col).cast("string")
    return pages.select(
        F.col(url_col).alias("src"),
        F.explode(F.regexp_extract_all(html_str, F.lit(HREF_RE), 1)).alias("dst"),
    )


def extract_anchor_texts(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages -> (src, dst, anchor): one row per simple ``<a href>TEXT</a>``
    occurrence (anchors with nested markup are out of the regex's simple
    scope and skipped — same single-pass codegen contract as
    extract_links). Anchor text is THE web-scale alias signal: what the
    rest of the web calls a page is the strongest surface form for the
    entity it denotes (the classic anchor-text trick search engines and
    alias dictionaries are built on)."""
    html_str = F.col(html_col).cast("string")
    return (
        pages.select(
            F.col(url_col).alias("src"),
            F.explode(
                F.arrays_zip(
                    F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), 1),
                    F.regexp_extract_all(html_str, F.lit(ANCHOR_RE), 2),
                )
            ).alias("_a"),
        )
        .select("src", F.col("_a.0").alias("dst"), F.col("_a.1").alias("anchor"))
    )


def anchor_alias_table(
    anchors: DataFrame, top_k: int = 5, min_count: int = 1
) -> DataFrame:
    """(src, dst, anchor) -> (dst, aliases: array<struct<anchor, n_refs>>)
    — per-target top-K anchor surfaces by referring count (count desc,
    anchor asc tie-break), the alias-dictionary feed for link/alias.py.
    BOUNDED: the per-dst array is capped at top_k via window row_number,
    never an unbounded collect_list; counts aggregate map-side first."""
    from pyspark.sql import Window

    counts = (
        anchors.where(F.trim(F.col("anchor")) != "")
        .groupBy("dst", "anchor")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .where(F.col("n_refs") >= min_count)
    )
    w = Window.partitionBy("dst").orderBy(F.desc("n_refs"), F.asc("anchor"))
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .groupBy("dst")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_rn", "anchor", "n_refs"))
            ).alias("_l")
        )
        .select(
            "dst",
            F.expr(
                "transform(_l, x -> struct(x.anchor AS anchor, x.n_refs AS n_refs))"
            ).alias("aliases"),
        )
    )
