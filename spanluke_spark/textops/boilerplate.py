"""Host-level boilerplate removal — drop nav menus, cookie banners and
footer lines that repeat across a host's pages (the Onion / jusText
document-frequency heuristic): a line is boilerplate for host h when it
appears in more than ``max_frac`` of h's pages (and at least
``min_pages`` of them, so 2-page hosts don't nuke their own content).

Shape at crawl scale: one posexplode of pages into (host, page, line)
rows, line identity carried as the 16-byte (length, xxhash64) pair so
the per-(host, line) document-frequency aggregate never shuffles line
text; the boilerplate line SET joins back onto the exploded stream on
the same compact key. Reassembly is a per-page sort of its OWN lines
(array_sort over a collect_list bounded by page length) — no window, no
global sort. Empty trailing lines survive (split with limit -1), so
clean pages round-trip byte-identically when nothing is boilerplate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lines(pages: DataFrame, host_col: str, id_col: str, text_col: str) -> DataFrame:
    return pages.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("page_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "line_no", "line"
        ),
    ).withColumn(
        "line_key",
        F.struct(F.length("line").alias("len"), F.xxhash64("line").alias("h")),
    )


def boilerplate_lines(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_frac: float = 0.5,
    min_pages: int = 2,
) -> DataFrame:
    """pages -> (host, line, n_pages, frac): the detected boilerplate
    lines per host with their document frequency."""
    lines = _lines(pages, host_col, id_col, text_col)
    host_sizes = pages.groupBy(F.col(host_col).alias("host")).agg(
        F.countDistinct(F.col(id_col)).alias("host_pages")
    )
    # the hot path (per-page dedup + document frequency) shuffles ONLY
    # the compact (len, hash) key — raw line text never enters an
    # exchange until the boilerplate key set (tiny: lines repeated
    # across >max_frac of a host) is known, then one exemplar per
    # surviving key is fetched back with a min() aggregate
    df = (
        lines.select("host", "page_id", "line_key")
        .distinct()
        .groupBy("host", "line_key")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )
    flagged = (
        df.join(host_sizes, "host")
        .withColumn("frac", F.col("n_pages") / F.col("host_pages"))
        .where(
            (F.col("n_pages") >= min_pages) & (F.col("frac") > max_frac)
        )
        .select("host", "line_key", "n_pages", "frac")
    )
    exemplar = (
        lines.join(
            flagged.select("host", "line_key"), ["host", "line_key"],
            "left_semi",
        )
        .groupBy("host", "line_key")
        .agg(F.min("line").alias("line"))
    )
    return flagged.join(exemplar, ["host", "line_key"]).select(
        "host", "line_key", "line", "n_pages", "frac"
    )


def strip_boilerplate(
    pages: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_frac: float = 0.5,
    min_pages: int = 2,
) -> DataFrame:
    """pages -> (host, page_id, clean_text, n_removed): each page's text
    with its host's boilerplate lines deleted (line order preserved)."""
    lines = _lines(pages, host_col, id_col, text_col)
    bp = boilerplate_lines(
        pages, host_col, id_col, text_col, max_frac, min_pages
    ).select("host", "line_key")
    kept = lines.join(bp, ["host", "line_key"], "left_anti")
    n_lines = lines.groupBy("host", "page_id").agg(
        F.count(F.lit(1)).alias("_n_total")
    )
    rebuilt = kept.groupBy("host", "page_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("line_no", "line"))
                ),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    # pages that were ALL boilerplate vanish from `kept`; restore them
    # with empty text via the per-page line totals
    return (
        n_lines.join(rebuilt, ["host", "page_id"], "left")
        .select(
            "host",
            "page_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("_n_total") - F.coalesce("_n_kept", F.lit(0))).alias(
                "n_removed"
            ),
        )
    )
