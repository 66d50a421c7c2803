"""Company/organization extraction by legal-suffix anchoring — the ORG
lane (the reference's E-NER dataset is EDGAR filings where BUSINESS
entities dominate; BASELINE.md Table II). A corporate legal suffix
("Ltd.", "Private Limited", "Inc.", "LLP") anchors the right edge of an
organization name with high precision; the name extends left over
capitalized tokens with lowercase connectors (the same grammar as
graph/citations.py parties).

Canonicalization: suffix variants collapse ("Pvt. Ltd." == "Private
Limited" -> ``pvt ltd``; "Ltd." == "Limited" -> ``ltd``) and the name
lowercases dotless — so "Tata Motors Ltd." and "TATA MOTORS LIMITED"
key one org node.

Scan-side shape: one regexp pass, codegen classification, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["org_mentions", "ORG_RX"]

_CAPW = r"[A-Z][\w.&]*"
# LAZY token run: the shortest name whose next tokens form a suffix —
# greedy would swallow "Pvt." into the name and reduce "Pvt. Ltd." to
# a bare "Ltd." suffix
_NAME = rf"{_CAPW}(?:(?:\s+(?:of|and|the|for))*\s+{_CAPW})*?"
# longest suffixes first so "Private Limited" wins over bare "Limited"
_SUFFIX = (
    r"Pvt\.?\s*Ltd\.?|Private\s+Limited|Public\s+Limited|Ltd\.?|Limited|"
    r"Inc\.?|Incorporated|LLP|LLC|Corp\.?|Corporation|Co\.|Company"
)
# (?!\w) blocks "Ltda" without rejecting a following sentence period
ORG_RX = rf"({_NAME})\s+({_SUFFIX})(?!\w)"


def _canon_suffix(raw: Column) -> Column:
    d = F.trim(F.lower(F.regexp_replace(raw, r"[.]", "")))
    d = F.regexp_replace(d, r"\s+", " ")
    return (
        F.when(d.isin("pvt ltd", "private limited"), F.lit("pvt ltd"))
        .when(d == "public limited", F.lit("plc"))
        .when(d.isin("ltd", "limited"), F.lit("ltd"))
        .when(d.isin("inc", "incorporated"), F.lit("inc"))
        .when(d.isin("corp", "corporation"), F.lit("corp"))
        .when(d.isin("co", "company"), F.lit("co"))
        .otherwise(d)
    )


def org_mentions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, name, suffix, org_key): one row per suffixed
    organization mention in document order; ``org_key`` = lowercase
    dotless name + canonical suffix."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(ORG_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    name = F.regexp_extract(m, ORG_RX, 1)
    suffix = _canon_suffix(F.regexp_extract(m, ORG_RX, 2))
    name_key = F.trim(
        F.lower(F.regexp_replace(F.regexp_replace(name, r"[.]", " "), r"\s+", " "))
    )
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        name.alias("name"),
        suffix.alias("suffix"),
        F.concat_ws(" ", name_key, suffix).alias("org_key"),
    )
