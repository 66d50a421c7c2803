"""Indian statute-citation extraction and normalization — the
STATUTE/PROVISION lane of the legal KG (the reference's LegalNER label
set carries STATUTE and PROVISION as first-class entity types; see
`/root/reference/legal_ner/` data config). Indian judgments cite
provisions in a handful of rigid surface forms:

    u/s 302/34 IPC                      (slash-joined section lists)
    under Sections 147, 148 and 149 of the Indian Penal Code
    Article 21 of the Constitution of India
    Section 482 Cr.P.C.

One combined regex finds every citation in document order; each citation
is split into its provision numbers (``302/34`` is TWO provisions read
together), and the statute surface is canonicalized (``IPC`` ==
``I.P.C.`` == ``Indian Penal Code``) with a dotless when-chain so the
same statute keys one KG node regardless of citation style.

Scale shape: identical to etl/quotes.py — one ``regexp_extract_all`` at
the scan, per-snippet group extraction and the provision-list explode
are all codegen, the heavy text column never survives the scan stage,
and nothing shuffles. Citation rows per page are bounded by page length,
so the double explode (citations x provisions) cannot skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["statute_citations", "canonical_statute", "CITE_RX", "NUM_RX"]

# one provision number: 302, 304B, 120B, 302(1)(b)
NUM_RX = r"\d+[A-Z]{0,2}(?:\([0-9A-Za-z]+\))*"
_SEP = r"\s*(?:,|/|and|or|read\s+with|r/w)\s*"
_NUMLIST = rf"{NUM_RX}(?:{_SEP}{NUM_RX})*"
_KW = r"[Uu]/s\.?|[Ss]ections?|[Ss]ec\.?|[Aa]rticles?|[Aa]rt\.?"
# named acts first (longest match), then the dotted/dotless abbreviations.
# Act names must START capitalized but may contain lowercase connectors
# ("Prevention of Corruption Act", "Transfer of Property Act").
_STATUTE = (
    r"(?:[A-Z][A-Za-z]*(?:\s+(?:of|and|the|[A-Z][A-Za-z]*))*\s+)?"
    r"(?:Act(?:,\s*\d{4})?|Code|Constitution(?:\s+of\s+India)?)"
    r"|Cr\.?\s?P\.?C\.?|I\.?P\.?C\.?|C\.?P\.?C\.?|I\.?E\.?A\.?"
)
# groups: 1 = keyword, 2 = provision list, 3 = statute surface
CITE_RX = rf"({_KW})\s+({_NUMLIST})(?:\s+of(?:\s+[Tt]he)?)?\s+({_STATUTE})"


def canonical_statute(raw: Column) -> Column:
    """Dotless canonical key for a statute surface form: the citation
    abbreviation and the full act name collapse to one node id."""
    d = F.upper(F.regexp_replace(raw, r"[.\s]+", " "))
    d = F.trim(F.regexp_replace(d, r"\s+", " "))
    return (
        F.when(d.contains("PENAL CODE") | (d == "I P C") | (d == "IPC"), F.lit("IPC"))
        .when(
            d.contains("CRIMINAL PROCEDURE") | d.rlike("^CR ?P C$|^CRPC$"),
            F.lit("CrPC"),
        )
        .when(d.contains("CIVIL PROCEDURE") | (d == "C P C") | (d == "CPC"), F.lit("CPC"))
        .when(d.contains("EVIDENCE") | (d == "I E A") | (d == "IEA"), F.lit("IEA"))
        .when(d.contains("CONSTITUTION"), F.lit("Constitution"))
        .otherwise(F.trim(raw))
    )


def statute_citations(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, cite_idx, sec_idx, provision, kind, statute): one row
    per provision number per citation occurrence, in document order.
    ``kind`` is ``article`` for Article/Art. citations, else ``section``;
    ``statute`` is the canonical key from :func:`canonical_statute`."""
    cite = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(CITE_RX), F.lit(0))
    ).alias("cite_idx", "_c")
    c = F.col("_c")
    prov = F.posexplode(
        F.regexp_extract_all(F.regexp_extract(c, CITE_RX, 2), F.lit(NUM_RX), F.lit(0))
    ).alias("sec_idx", "provision")
    kind = F.when(
        F.lower(F.regexp_extract(c, CITE_RX, 1)).startswith("art"), F.lit("article")
    ).otherwise(F.lit("section"))
    return (
        df.select(F.col(id_col), cite)
        .select(
            id_col,
            "cite_idx",
            prov,
            kind.alias("kind"),
            canonical_statute(F.regexp_extract(c, CITE_RX, 3)).alias("statute"),
        )
    )
