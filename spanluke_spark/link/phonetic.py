"""Phonetic blocking keys — American Soundex as a pure native-function
column expression (upper/translate/regexp_replace/rpad — whole-stage
codegen, zero Python in the hot path), feeding the entity-resolution
blocking family: names that SOUND alike share a 4-char key, so
Levenshtein/Fellegi-Sunter verification (link/editdist.py,
link/fellegi.py) runs inside phonetic blocks instead of all pairs — the
classic ER recipe (Soundex is literally the blocking key of the 1918
census indexing rules the algorithm comes from).

Full rule set, including the two everyone skips (both pytest-anchored
against the published test vectors Ashcraft=A261, Pfister=P236,
Tymczak=T522, Honeyman=H555):
  - same-code letters separated by H or W are coded ONCE (H/W map to a
    '-' marker; two bridge passes merge equal digits across markers
    before markers drop — two passes bound the realistic bridge depth
    and keep the expression chain fixed and oracle-replayable);
  - same-code letters separated by a vowel are coded TWICE (vowels map
    to '0', which breaks digit adjacency, and zeros strip after the
    collapse);
  - the first letter is kept verbatim and its own code slot is
    suppressed (dropped when the first letter is digit-coded; a leading
    vowel contributes a zero that strips; a leading H/W marker drops).

Every step is a deterministic string rewrite, so the DuckDB oracle
replays the full chain (q273) — the only syntax split is the
backreference spelling ($1 in Spark's Java regex, \\1 + the 'g' flag in
DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["soundex", "soundex_blocks"]

_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_TO = "000000--111122222222334556"
_DIGIT_FIRST = "BFPVCGJKQSXZDTLMNR"


def soundex(name: Column) -> Column:
    """American Soundex of a name column; NULL for strings with no
    letters. Native-function chain, no UDF."""
    s = F.upper(F.regexp_replace(name, "[^A-Za-z]", ""))
    first = F.substring(s, 1, 1)
    coded = F.translate(s, _FROM, _TO)
    bridged = F.regexp_replace(coded, r"(\d)-+\1", r"$1")
    bridged = F.regexp_replace(bridged, r"(\d)-+\1", r"$1")
    collapsed = F.regexp_replace(F.translate(bridged, "-", ""), r"(\d)\1+", r"$1")
    tail = F.when(
        first.rlike(f"[{_DIGIT_FIRST}]"), F.substring(collapsed, 2, 1000)
    ).otherwise(collapsed)
    digits = F.translate(tail, "0", "")
    return F.when(
        F.length(s) > 0,
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0")),
    )


def soundex_blocks(
    names: DataFrame, name_col: str = "name", id_col: str = "id"
) -> DataFrame:
    """(id, name) -> per-key block stats (soundex, n_rows,
    n_distinct_names): the blocking profile an ER pipeline reads before
    deciding the verify budget (q88's skew discipline for phonetic
    keys). Rows with letterless names fall out (NULL key)."""
    keyed = names.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        soundex(F.col(name_col)).alias("soundex"),
    ).where(F.col("soundex").isNotNull())
    return keyed.groupBy("soundex").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("name").alias("n_distinct_names"),
    )
