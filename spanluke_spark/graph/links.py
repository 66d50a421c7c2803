"""Web-graph extraction from the pages table: href targets out of raw HTML.

Pure codegen (`regexp_extract_all` over the decoded binary) — at 10^12 pages
the link explode happens after column pruning, so only (url, target) pairs
flow into the graph builders (pagerank.py, canon/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HREF_RE = r'href="([^"]+)"'


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
