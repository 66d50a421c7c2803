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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "quote_attributions",
    "quote_attributions_ordered",
    "resolve_pronoun_speakers",
    "QUOTE_PATTERNS",
    "PRONOUNS",
]

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


# Pronoun "speakers" the coref pass resolves to the nearest preceding
# NAMED speaker in the same document. ``_SPK`` ([A-Z]\w*) already matches
# these, so they flow through the extraction lanes unchanged and only the
# resolution step treats them specially.
PRONOUNS = ("He", "She", "They", "It")

_COMBINED = "|".join(f"(?:{rx})" for rx, _, _ in QUOTE_PATTERNS.values())


def quote_attributions_ordered(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, speaker, quote, pattern) with ``idx`` the 0-based
    DOCUMENT-ORDER occurrence index across all three constructions.

    One ``regexp_extract_all`` over the alternation of all three pattern
    regexes keeps matches in document order (the per-lane union in
    :func:`quote_attributions` cannot), which is what pronoun coref needs.
    Each matched snippet is then classified by re-testing the individual
    patterns in declaration order — all codegen, zero shuffle; the heavy
    text column dies at the scan."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(_COMBINED), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    hit = {n: F.regexp_extract(m, rx, 0) != F.lit("") for n, (rx, _, _) in QUOTE_PATTERNS.items()}

    def first_match(g: str) -> Column:
        # classify the snippet: first pattern (declaration order) that
        # matches it supplies the speaker/quote groups
        out = F.lit(None).cast("string")
        for n, (rx, sg, qg) in reversed(QUOTE_PATTERNS.items()):
            grp = sg if g == "speaker" else qg
            out = F.when(hit[n], F.regexp_extract(m, rx, grp)).otherwise(out)
        return out

    pattern = F.lit(None).cast("string")
    for n in reversed(QUOTE_PATTERNS):
        pattern = F.when(hit[n], F.lit(n)).otherwise(pattern)

    return (
        df.select(F.col(id_col), snip)
        .select(
            id_col,
            "idx",
            first_match("speaker").alias("speaker"),
            F.regexp_replace(first_match("quote"), r"[,.!?]+$", "").alias("quote"),
            pattern.alias("pattern"),
        )
        .where(F.length("quote") > 0)
    )


def resolve_pronoun_speakers(
    ordered: DataFrame,
    id_col: str = "doc_id",
    pronouns: tuple[str, ...] = PRONOUNS,
) -> DataFrame:
    """Coref-lite over :func:`quote_attributions_ordered` output: a
    pronoun speaker resolves to the nearest PRECEDING named speaker in
    the same document (the dominant attribution form in real news is
    ``"...," he said`` after one named introduction). Adds

      - ``is_pronoun``: whether the surface speaker was a pronoun
      - ``resolved_speaker``: the antecedent name, or the pronoun itself
        when no named speaker precedes it (first-mention pronouns)

    Shape: ONE window keyed by document (rows-between unbounded..-1,
    ``last`` ignorenulls). Partitions are per-document and documents are
    bounded, so the shuffle is uniform; no arrays, no driver state."""
    is_pron = F.col("speaker").isin(*pronouns)
    named = F.when(~is_pron, F.col("speaker"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ordered.select(
        "*",
        is_pron.alias("is_pronoun"),
        F.coalesce(
            named, F.last(named, ignorenulls=True).over(w), F.col("speaker")
        ).alias("resolved_speaker"),
    )
