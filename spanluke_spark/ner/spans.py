"""Span enumeration — the reference's signature operator (SURVEY.md §2.9).

Semantics pinned by the IOB2 reconstruction at legal_ner/main.py:402-406:
spans are enumerated in order (start = 0..n-1, end = start+1..min(start+L, n)),
end-exclusive word indices, L = entity_max_length (6 by default,
legal_ner/main.py:492, justified by corpus stats: mean entity 2.94±2.6 words).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTITY_MAX_LENGTH = 6  # legal_ner/main.py:492


def py_enumerate_spans(num_words: int, max_length: int = ENTITY_MAX_LENGTH) -> list[tuple[int, int]]:
    """All contiguous word n-grams up to ``max_length``, reference order."""
    return [
        (s, e)
        for s in range(num_words)
        for e in range(s + 1, min(s + max_length, num_words) + 1)
    ]


def enumerate_spans_relational(
    df: DataFrame, num_words_col: str = "num_words", max_length: int = ENTITY_MAX_LENGTH
) -> DataFrame:
    """Relational span enumeration: two nested ``explode(sequence(...))``.

    Used by oracle-checked queries; the scoring hot path enumerates inside the
    pandas UDF instead so spans never hit the shuffle (SURVEY.md §2.9).
    Adds (span_idx, w_start, w_end) per input row; w_end exclusive.
    """
    n = F.col(num_words_col)
    with_start = df.filter(n > 0).select(
        "*", F.explode(F.sequence(F.lit(0), n - 1)).alias("w_start")
    )
    s = F.col("w_start")
    spans = with_start.select(
        "*",
        F.explode(
            F.sequence(s + 1, F.least(s + F.lit(max_length), n))
        ).alias("w_end"),
    )
    # span_idx = position in the reference enumeration order: spans before
    # start s = sum_{i<s} min(L, n-i); within s, offset = w_end - s - 1.
    # Closed form: for i < s, min(L, n-i) = L when i <= n-L else n-i.
    L = F.lit(max_length)
    full = F.least(s, F.greatest(n - L, F.lit(0)))  # starts with full L spans
    rest_cnt = s - full  # starts in the tail where span count shrinks
    # sum over tail starts i in [full, s): (n - i) = rest_cnt*n - sum(i)
    tail_sum = rest_cnt * n - (
        (s - 1 + full) * rest_cnt / F.lit(2)
    ).cast("long")
    return spans.withColumn(
        "span_idx", (full * L + tail_sum + (F.col("w_end") - s - 1)).cast("int")
    )
