"""PII redaction for training-data curation: scrub emails, NANP-style phone
numbers, and IPv4 addresses from document text before it reaches a model.

Everything is `regexp_replace` / `regexp_extract_all` — pure JVM codegen, one
pass over the text, no shuffle, no Python. The patterns stay inside the
regex subset shared by Java's engine and RE2 (DuckDB), so the oracle query
can replay them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied IN ORDER: emails first so their
# digit-bearing domains can't later match the IP pattern, phones before IPs
# so a dashed number is consumed whole.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redacted(text: Column) -> Column:
    """The text with all PII patterns replaced, applied in PII_PATTERNS order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_redacted`` plus per-category hit counts (``n_email``,
    ``n_phone``, ``n_ipv4``) and a total ``n_pii``.

    Pattern i is counted on the text AFTER replacements 0..i-1 — the same
    progressive order the substitutions run in — so an overlapping match a
    later pattern would re-find (e.g. a phone-shaped local part inside an
    already-consumed email) is not double-counted, and ``n_pii`` equals the
    number of substitutions actually performed in ``text_redacted``.
    """
    stage = F.col(text_col)
    counts: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.size(F.regexp_extract_all(stage, F.lit(pat), 0)).cast("long")
        stage = F.regexp_replace(stage, pat, repl)
    return df.select(
        "*",
        redacted(F.col(text_col)).alias("text_redacted"),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
    ).withColumn(
        "n_pii", sum(F.col(f"n_{name}") for name, _, _ in PII_PATTERNS).cast("long")
    )
