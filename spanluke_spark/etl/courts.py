"""Court and witness mention extraction — the COURT and WITNESS lanes of
the legal KG (both are first-class LegalNER labels in the reference's
label set, `/root/reference/legal_ner/` data config; schemas.py carries
them). Indian judgments name the forum with rigid cause-title forms
("IN THE SUPREME COURT OF INDIA", "HIGH COURT OF JUDICATURE AT BOMBAY")
and refer to witnesses by prosecution/defence numbering ("PW-1",
"DW 2", "CW.3").

Both extractors are the quotes/statutes shape: one case-insensitive
``regexp_extract_all`` at the scan preserving document order, codegen
classification, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["court_mentions", "witness_refs", "COURT_RX", "WITNESS_RX"]

_CITY = r"[A-Za-z]+"
# lanes ordered most-specific first; alternation order = classification order
_SUPREME = r"Supreme\s+Court\s+of\s+India"
_HIGH = rf"High\s+Court\s+(?:of\s+(?:Judicature\s+at\s+)?|at\s+)({_CITY})"
_SESSIONS = r"Court\s+of\s+Sessions?|Sessions?\s+Court"
_DISTRICT = rf"District\s+Court(?:\s+of\s+({_CITY}))?"
COURT_RX = rf"(?i)({_SUPREME})|(?:{_HIGH})|({_SESSIONS})|(?:{_DISTRICT})"
# groups: 1 supreme, 2 high-court city, 3 sessions, 4 district city

WITNESS_RX = r"\b(PW|DW|CW)\s?[-./]?\s?(\d+)\b"
_SIDE = {"PW": "prosecution", "DW": "defence", "CW": "court"}


def court_mentions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, surface, court, level): one row per court
    mention in document order. ``court`` is the canonical lowercase key
    ("supreme court of india", "high court of bombay", ...); ``level``
    classifies the forum (supreme/high/sessions/district)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(COURT_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")

    def g(i: int):
        return F.regexp_extract(m, COURT_RX, i)

    level = (
        F.when(g(1) != "", F.lit("supreme"))
        .when(g(2) != "", F.lit("high"))
        .when(g(3) != "", F.lit("sessions"))
        .otherwise(F.lit("district"))
    )
    court = (
        F.when(g(1) != "", F.lit("supreme court of india"))
        .when(g(2) != "", F.concat(F.lit("high court of "), F.lower(g(2))))
        .when(g(3) != "", F.lit("sessions court"))
        .when(g(4) != "", F.concat(F.lit("district court of "), F.lower(g(4))))
        .otherwise(F.lit("district court"))
    )
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        m.alias("surface"),
        court.alias("court"),
        level.alias("level"),
    )


def witness_refs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, surface, witness_no, side): one row per PW/DW/CW
    reference in document order; ``side`` resolves the numbering scheme
    (prosecution/defence/court witness)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(WITNESS_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    kind = F.upper(F.regexp_extract(m, WITNESS_RX, 1))
    side = F.lit(None).cast("string")
    for k, v in _SIDE.items():
        side = F.when(kind == k, F.lit(v)).otherwise(side)
    return df.select(F.col(id_col), snip).select(
        id_col,
        "idx",
        m.alias("surface"),
        F.regexp_extract(m, WITNESS_RX, 2).cast("int").alias("witness_no"),
        side.alias("side"),
    )
