"""Quote attribution extraction: mine (speaker, quotation) pairs from
webtext with the three canonical journalistic constructions — the
claim-provenance lane of a web-fact pipeline (quotes are facts whose
subject is the SPEAKER, so attribution errors poison the KG; cf. the
quootstrap pattern-bootstrapping literature on Common Crawl news).

Patterns (speaker NP = one or two capitalized tokens here; swap the token
class for an NER span in production — the relational shape is identical):

  P1 said_after   ``"Q," said Jane Doe``
  P2 said_before  ``Jane Doe said: "Q"``
  P3 according    ``According to Jane Doe, "Q"``

Scale shape: identical to etl/hearst.py — every lane is one
``regexp_extract_all`` in codegen at scan time, the three lanes are a
plan-level union over ONE scan, and nothing shuffles until whatever tiny
aggregate the caller runs on the extracted pairs. Trailing punctuation
inside the closing quote (the ``"...," said`` comma) is stripped
engine-side so quotes compare equal across constructions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quote_attributions", "QUOTE_PATTERNS"]

_SPK = r"[A-Z]\w*(?: [A-Z]\w*)?"

# name -> (regex, speaker_group, quote_group)
QUOTE_PATTERNS: dict[str, tuple[str, int, int]] = {
    "said_after": (rf'"([^"]+)," said ({_SPK})', 2, 1),
    "said_before": (rf'({_SPK}) said: "([^"]+)"', 1, 2),
    "according": (rf'[Aa]ccording to ({_SPK}), "([^"]+)"', 1, 2),
}


def _lane(df: DataFrame, text: Column, id_col: str, name: str) -> DataFrame:
    rx, sg, qg = QUOTE_PATTERNS[name]
    snip = F.explode(F.regexp_extract_all(text, F.lit(rx), F.lit(0))).alias("_m")
    return df.select(F.col(id_col), snip).select(
        id_col,
        F.regexp_extract(F.col("_m"), rx, sg).alias("speaker"),
        F.regexp_replace(
            F.regexp_extract(F.col("_m"), rx, qg), r"[,.!?]+$", ""
        ).alias("quote"),
        F.lit(name).alias("pattern"),
    )


def quote_attributions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, speaker, quote, pattern): one row per attributed
    quotation occurrence, all three lanes unioned plan-side."""
    text = F.col(text_col)
    parts = [_lane(df, text, id_col, n) for n in QUOTE_PATTERNS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.length("quote") > 0)
