"""Docket-identifier extraction — the registry numbers that ARE a
case's primary key in a legal KG ("Criminal Appeal No. 124 of 2005",
"W.P. (C) No. 1234/2019", "FIR No. 123/2004"). Linking a crawled
judgment page to its docket node is what lets re-crawls, citing pages
and cause-list feeds converge on one case entity; party-name keys
(graph/citations.case_mentions) are the fuzzy fallback, docket keys are
the exact one.

One codegen regexp pass in document order (the quotes/statutes shape),
then a canonical ``docket_key`` = lowercased kind + number + year so
"No. 124 of 2005" and "No. 124/2005" collide.

Cross-references to paragraphs ("as held in para 14 above") are the
intra-document anchor lane: `para_crossrefs` extracts them, and
`validated_crossrefs` left-joins against etl/paragraphs.split_paragraphs
output to flag dangling references — a data-quality signal for the
extraction pipeline itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "docket_refs",
    "para_crossrefs",
    "validated_crossrefs",
    "DOCKET_RX",
    "PARA_REF_RX",
]

# kind phrases: "Criminal Appeal", "Civil Appeal", "Writ Petition",
# "W.P. (C)", "S.L.P.", "FIR", "Crime" — extensible alternation
_KIND = (
    r"Criminal Appeal|Civil Appeal|Writ Petition|W\.P\.\s*\(C\)|"
    r"S\.L\.P\.|Special Leave Petition|Review Petition|FIR|Crime"
)
# number + year: "No. 124 of 2005" | "No. 124/2005"
DOCKET_RX = rf"(?i)\b({_KIND})\s+No\.?\s*(\d+)\s*(?:of\s+|/)\s*((?:19|20)\d\d)\b"

PARA_REF_RX = r"(?i)\bpara(?:graph)?s?\.?\s+(\d+)\b"


def docket_refs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, kind, number, year, docket_key): one row per
    docket mention in document order. ``docket_key`` canonicalizes the
    kind (lowercase, dots/spaces collapsed) + number + year."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(DOCKET_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    kind = F.regexp_extract(m, DOCKET_RX, 1)
    number = F.regexp_extract(m, DOCKET_RX, 2)
    year = F.regexp_extract(m, DOCKET_RX, 3)
    kind_key = F.regexp_replace(F.lower(kind), r"[.\s()]+", "")
    key = F.concat_ws(":", kind_key, number, year)
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        kind.alias("kind"),
        number.cast("int").alias("number"),
        year.cast("int").alias("year"),
        key.alias("docket_key"),
    )


def para_crossrefs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, ref_para): one row per "para N" reference in
    document order."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(PARA_REF_RX), F.lit(0))
    ).alias("idx", "_m")
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        F.regexp_extract(F.col("_m"), PARA_REF_RX, 1).cast("int").alias("ref_para"),
    )


def validated_crossrefs(
    refs: DataFrame, paragraphs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """refs x split_paragraphs -> (id_col, idx, ref_para, resolved):
    ``resolved`` is true when the referenced paragraph number exists in
    the same document. Equi-join on (id, para_no) — both sides keyed,
    the paragraphs side already reduced to one row per paragraph."""
    targets = paragraphs.select(
        F.col(id_col), F.col("para_no").alias("ref_para"), F.lit(True).alias("resolved")
    ).distinct()
    return refs.join(targets, [id_col, "ref_para"], "left").select(
        id_col,
        "idx",
        "ref_para",
        F.coalesce("resolved", F.lit(False)).alias("resolved"),
    )
