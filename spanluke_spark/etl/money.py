"""Monetary-amount and sentence-term extraction — the financial/penalty
lanes of the legal KG (the reference's second dataset is E-NER, EDGAR
financial entities: `/root/reference/legal_ner/` + BASELINE.md Table II;
MONEY-like surface forms dominate both EDGAR filings and the fine/
compensation clauses of judgments).

Indian amounts use the lakh/crore grouping ("Rs. 5,00,000",
"Rs. 1.2 crore", "₹ 10 lakhs") next to western forms ("$3 million");
normalization to a plain numeric value is pure codegen arithmetic:
strip grouping commas, multiply by the unit word's factor.

Sentence terms ("rigorous imprisonment for 10 years", "simple
imprisonment of 6 months") normalize to months with a regime flag —
the severity signal a charge edge (etl/statutes.py) carries.

Same scan-side shape as every legal lane: one combined regexp pass in
document order, codegen classification and arithmetic, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["money_amounts", "sentence_terms", "MONEY_RX", "TERM_RX"]

_NUM = r"\d+(?:,\d+)*(?:\.\d+)?"
_UNIT = r"lakhs?|lacs?|crores?|million|billion|thousand"
# groups: 1 currency, 2 number, 3 optional unit word. Word-boundary per
# ALTERNATIVE: \b before "$" or "₹" can never match (both non-word), so
# only the lettered currencies carry it.
MONEY_RX = rf"(?i)(\bRs\.?|\bINR\b|₹|\bUSD\b|\$)\s*({_NUM})\s*({_UNIT})?\b"

_UNIT_FACTOR = {
    "lakh": 100_000.0,
    "lac": 100_000.0,
    "crore": 10_000_000.0,
    "million": 1_000_000.0,
    "billion": 1_000_000_000.0,
    "thousand": 1_000.0,
}

# groups: 1 regime (rigorous/simple/life), 2 count, 3 unit
TERM_RX = (
    r"(?i)\b(rigorous|simple)\s+imprisonment\s+(?:for|of)\s+"
    r"(\d+)\s+(years?|months?|days?)\b"
)


def money_amounts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, surface, currency, amount): one row per amount
    in document order; ``currency`` is INR or USD, ``amount`` the
    normalized numeric value (commas stripped, unit factor applied)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(MONEY_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    cur_raw = F.upper(F.regexp_extract(m, MONEY_RX, 1))
    currency = F.when(
        cur_raw.isin("$", "USD"), F.lit("USD")
    ).otherwise(F.lit("INR"))
    base = F.regexp_replace(F.regexp_extract(m, MONEY_RX, 2), ",", "").cast(
        "double"
    )
    unit = F.lower(F.regexp_extract(m, MONEY_RX, 3))
    factor = F.lit(1.0)
    for u, f in _UNIT_FACTOR.items():
        factor = F.when(unit.startswith(u), F.lit(f)).otherwise(factor)
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        m.alias("surface"),
        currency.alias("currency"),
        (base * factor).alias("amount"),
    )


def sentence_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, regime, term_months): imprisonment terms
    normalized to months (years*12, days/30 rounded down to keep the
    value integral and engine-portable)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(TERM_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    regime = F.lower(F.regexp_extract(m, TERM_RX, 1))
    count = F.regexp_extract(m, TERM_RX, 2).cast("int")
    unit = F.lower(F.regexp_extract(m, TERM_RX, 3))
    months = (
        F.when(unit.startswith("year"), count * 12)
        .when(unit.startswith("month"), count)
        .otherwise(F.floor(count / 30).cast("int"))
    )
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        regime.alias("regime"),
        months.cast("int").alias("term_months"),
    )
