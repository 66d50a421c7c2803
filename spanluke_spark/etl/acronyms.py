"""Acronym-expansion mining from parenthetical definitions — alias
bootstrapping for the KG linker. Legal and web text define short forms
inline ("the Prevention of Corruption Act (PCA)"), and those pairs are
exactly the alias dictionary rows `link/alias.py` broadcasts; mining
them from the corpus closes the loop (the Schwartz-Hearst 2003
parenthetical algorithm, restricted to its high-precision variant:
the acronym must equal the concatenated capital letters of the
candidate long form).

Shape: one ``regexp_extract_all`` at the scan finds ``Long Form (ABBR)``
candidates in document order; validation is a single codegen string
identity — strip every non-capital from the long form and compare to
the acronym — so the whole miner is scan-side with zero Python and zero
shuffle. Support counting (how many docs define the same pair) is a
standard two-phase count-distinct on the tiny extracted relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["acronym_definitions", "acronym_support", "ACRO_RX"]

# candidate long form: capitalized words joined by optional lowercase
# connectors (same party grammar as graph/citations.py), immediately
# followed by a parenthesized 2-8 letter capital acronym
_CAPW = r"[A-Z]\w*"
_LONG = rf"{_CAPW}(?:(?:\s+(?:of|and|the|for))*\s+{_CAPW})*"
ACRO_RX = rf"({_LONG})\s*\(([A-Z]{{2,8}})\)"


def acronym_definitions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, long_form, acronym): one row per VALIDATED
    parenthetical definition in document order. Validation: the acronym
    must equal the capital letters of the long form in order ("Prevention
    of Corruption Act" -> "PCA"); mismatched parentheticals (ordinary
    bracketed asides) are dropped."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(ACRO_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    long_form = F.regexp_extract(m, ACRO_RX, 1)
    acro = F.regexp_extract(m, ACRO_RX, 2)
    initials = F.regexp_replace(long_form, r"[^A-Z]", "")
    return (
        df.select(F.col(id_col), snip)
        .select(
            id_col,
            "idx",
            long_form.alias("long_form"),
            acro.alias("acronym"),
            initials.alias("_init"),
        )
        .where(F.col("_init") == F.col("acronym"))
        .drop("_init")
    )


def acronym_support(defs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, long_form, acronym) -> (acronym, long_form, n_docs):
    distinct defining documents per pair — the alias-dictionary weight
    (ambiguous acronyms keep one row per expansion; the linker
    disambiguates by weight + context, link/disambig.py)."""
    return (
        defs.select(id_col, "long_form", "acronym")
        .distinct()
        .groupBy("acronym", "long_form")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
