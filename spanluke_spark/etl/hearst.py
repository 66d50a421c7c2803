"""Hearst-pattern taxonomy induction: mine is-a (hyponym, hypernym) pairs
from raw webtext with the classic lexico-syntactic patterns (Hearst 1992,
"Automatic Acquisition of Hyponyms from Large Text Corpora") — the standard
first mile of taxonomy construction over a crawl (WebIsA/WebIsALOD build
their 400M-pair database from Common Crawl with exactly this family).

Patterns supported (NP = single lowercase token here; a production run
swaps the token class for a chunker's NP spans — the relational shape is
identical):

  P1  "H such as X, Y and Z"        -> (X|Y|Z, H)
  P2  "H, including X and Y"        -> (X|Y, H)
  P3  "H, especially X or Y"        -> (X|Y, H)
  P4  "X, Y and other H" / "or other" -> (X|Y, H)

Scale shape: every pattern is a ``regexp_extract_all`` over the text column
— pure codegen inside the scan stage, zero Python, zero shuffle. The four
pattern branches are a plan-level union (no re-scan: Spark pushes the
shared scan under the union and AQE coalesces). The ONLY exchange in
``taxonomy_support`` is the final (hyponym, hypernym) hash aggregate, whose
key space is the extracted-pair vocabulary — tiny next to the corpus.
Candidate lists ("X, Y and Z") are split engine-side with one ``split``;
no per-row Python loops, so the operator runs at scan throughput on a
100 TB crawl.

Why groups are re-extracted per match: Spark's regexp_extract_all returns
ONE capture group per call, so each branch extracts whole matches (group 0)
and re-applies the anchored pattern to the short matched snippet for the
head/list groups — two regex passes over <100-char snippets instead of a
second full-text pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hearst_isa_pairs", "taxonomy_support", "HEARST_PATTERNS"]

# one token NP; list = "x", "x, y", "x, y and z", "x or y", "x, y, or z".
# The and/or separator alternative is tried BEFORE the bare comma at every
# item boundary, so an Oxford-comma ", and plums" binds as separator+item
# rather than the greedy (?:, \w+)* swallowing "and" as a list member.
_LIST = r"\w+(?:(?:,? (?:and|or) |, )\w+)*"

# name -> (regex, head_group, list_group)
HEARST_PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as": (rf"(\w+) such as ({_LIST})", 1, 2),
    "including": (rf"(\w+), including ({_LIST})", 1, 2),
    "especially": (rf"(\w+), especially ({_LIST})", 1, 2),
    "other": (rf"({_LIST}),? (?:and|or) other (\w+)", 2, 1),
}

_LIST_SEP = r",? (?:and|or) |, "


def _pattern_pairs(
    df: DataFrame, text: Column, id_col: str, name: str
) -> DataFrame:
    rx, head_g, list_g = HEARST_PATTERNS[name]
    snip = F.explode(F.regexp_extract_all(text, F.lit(rx), F.lit(0))).alias("_m")
    out = df.select(F.col(id_col), snip).select(
        id_col,
        F.lower(F.regexp_extract(F.col("_m"), rx, head_g)).alias("hypernym"),
        F.explode(
            F.split(F.regexp_extract(F.col("_m"), rx, list_g), _LIST_SEP)
        ).alias("hyponym"),
    )
    return out.select(
        id_col,
        F.lower(F.col("hyponym")).alias("hyponym"),
        "hypernym",
        F.lit(name).alias("pattern"),
    )


def hearst_isa_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, hyponym, hypernym, pattern): one row per extracted
    is-a pair occurrence, all four Hearst patterns unioned plan-side."""
    text = F.col(text_col)
    parts = [_pattern_pairs(df, text, id_col, n) for n in HEARST_PATTERNS]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # a list item can equal the head on degenerate text; drop self-loops
    return out.where(F.col("hyponym") != F.col("hypernym"))


def taxonomy_support(
    pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Aggregate pair occurrences into taxonomy edges with evidence:
    (hyponym, hypernym, n_docs, n_mentions, n_patterns). Confidence
    filtering (n_docs >= k, pattern diversity) happens downstream on this
    tiny edge relation, never on the corpus."""
    return pairs.groupBy("hyponym", "hypernym").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count("*").alias("n_mentions"),
        F.countDistinct("pattern").alias("n_patterns"),
    )
