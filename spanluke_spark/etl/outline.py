"""HTML heading-outline extraction: recover the h1–h6 section tree of every
page — the document-structure signal LLM-data pipelines use for structure-
aware chunking (split at section boundaries, prepend the heading path) and
boilerplate scoping, and KG pipelines use to attach facts to the section
that asserts them.

Output per heading: document position, level, text, and ``parent_pos`` —
the position of the nearest PRECEDING heading with a strictly smaller
level (the HTML5 outline parent). A page's outline is recovered without
any recursion or iteration:

Scale shape: heading extraction is one ``regexp_extract_all`` in codegen
at scan time (the html column never shuffles — only the extracted
(id, pos, level, heading) rows, a tiny fraction of page bytes, reach the
wire). Parent resolution is ONE window pass partitioned by page: five
running ``max(pos) filter level=k`` columns over the same window frame
share a single sort+shuffle, and the parent is a CASE over them — nearest
smaller level = max position among levels < L, because positions increase
monotonically. No self-join, no per-page Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["heading_outline"]

_H_SNIPPET = r"<[hH]([1-6])[^>]*>[^<]*</[hH][1-6]\s*>"


def heading_outline(
    df: DataFrame, html_col: str = "html", id_col: str = "url"
) -> DataFrame:
    """-> (id_col, pos, level, heading, parent_pos): every h1–h6 heading in
    document order (pos is 1-based), with the HTML5 outline parent
    (parent_pos NULL for top-of-tree headings)."""
    html = F.col(html_col).cast("string")
    snips = df.select(
        id_col,
        F.posexplode(F.regexp_extract_all(html, F.lit(_H_SNIPPET), F.lit(0))).alias(
            "_i", "_m"
        ),
    )
    heads = snips.select(
        id_col,
        (F.col("_i") + 1).cast("long").alias("pos"),
        F.regexp_extract("_m", r"<[hH]([1-6])", 1).cast("int").alias("level"),
        F.trim(F.regexp_extract("_m", r">([^<]*)<", 1)).alias("heading"),
    )
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastk = [
        F.max(F.when(F.col("level") == k, F.col("pos"))).over(w).alias(f"_l{k}")
        for k in range(1, 6)
    ]
    with_last = heads.select("*", *lastk)
    parent = F.lit(None).cast("long")
    # build CASE level=L -> greatest(last_1..last_{L-1}); greatest ignores
    # NULLs in both Spark and the DuckDB twin
    for lv in range(2, 7):
        cands = [F.col(f"_l{k}") for k in range(1, lv)]
        expr = cands[0] if len(cands) == 1 else F.greatest(*cands)
        parent = F.when(F.col("level") == lv, expr).otherwise(parent)
    return with_last.select(
        id_col, "pos", "level", "heading", parent.alias("parent_pos")
    )
