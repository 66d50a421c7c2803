"""Numbered-paragraph segmentation — Indian judgments (and most
structured legal text) number their paragraphs at line start ("1. The
appellant..."), and per-paragraph provenance is the granularity a legal
KG cites (a fact anchored to "doc X para 14" survives re-crawls of the
page; a byte offset alone does not).

Shape: one codegen ``split`` on a multiline lookahead (zero-width, so
segment text is preserved verbatim and offsets reconstruct exactly),
one per-document window for the running character offset, then the
paragraph filter. The heavy text column dies at the scan; the window
shuffles one row per SEGMENT (bounded by document length), keyed by
document — uniform at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["split_paragraphs"]

# zero-width split points: line starts that open a numbered paragraph
_PARA_SPLIT = r"(?m)(?=^\d+\.\s)"


def split_paragraphs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, para_no, char_start, body): one row per NUMBERED
    paragraph; ``char_start`` is the 0-based character offset of the
    paragraph marker in the original text (preamble text before the
    first marker counts toward offsets but is not emitted); ``body`` is
    the paragraph text with the marker stripped and edges trimmed."""
    seg = F.posexplode(
        F.split(F.col(text_col), _PARA_SPLIT)
    ).alias("_i", "_seg")
    w = (
        Window.partitionBy(id_col)
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(F.col(id_col), seg)
        .select(
            id_col,
            "_i",
            "_seg",
            F.coalesce(F.sum(F.length("_seg")).over(w), F.lit(0)).alias(
                "char_start"
            ),
        )
        .where(F.col("_seg").rlike(r"^\d+\.\s"))
        .select(
            id_col,
            F.regexp_extract("_seg", r"^(\d+)\.", 1).cast("int").alias("para_no"),
            F.col("char_start").cast("long").alias("char_start"),
            # trim() strips only spaces; paragraphs end in newlines
            F.regexp_replace(
                F.regexp_replace("_seg", r"^\d+\.\s+", ""), r"^\s+|\s+$", ""
            ).alias("body"),
        )
    )
