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


# Candidate payment-card numbers: 13-19 digits with optional single
# space/dash separators. \b (not lookaround) so the pattern stays in
# the Java∩RE2 subset the oracle can replay.
CARD_PATTERN = r"\b\d(?:[ -]?\d){12,18}\b"


def luhn_checksum(digits: Column) -> Column:
    """Luhn mod-10 checksum (ISO/IEC 7812-1 Annex B; Luhn 1960, US
    patent 2,950,048) of a digit-only string, as a pure native HOF:
    reverse, then from the right double every second digit and
    subtract 9 when it exceeds 9; the string validates iff the sum is
    0 mod 10. No Python, no UDF — one aggregate over the char
    positions."""
    rev = F.reverse(digits)
    return (
        F.aggregate(
            F.sequence(F.lit(0), F.length(digits) - 1),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(
                j % 2 == 0,
                F.ascii(rev.substr(j + 1, F.lit(1))) - 48,
            ).otherwise(
                F.when(
                    F.ascii(rev.substr(j + 1, F.lit(1))) - 48 > 4,
                    2 * (F.ascii(rev.substr(j + 1, F.lit(1))) - 48) - 9,
                ).otherwise(
                    2 * (F.ascii(rev.substr(j + 1, F.lit(1))) - 48)
                )
            ),
        )
        % 10
    )


def luhn_valid(digits: Column) -> Column:
    """True iff the digit string passes the Luhn check (and is 13-19
    digits — the ISO/IEC 7812 PAN length range)."""
    return (
        F.length(digits).between(13, 19) & (luhn_checksum(digits) == 0)
    )


def redact_card_numbers(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``text_redacted`` (Luhn-VALID card candidates replaced by
    ``<CARD>``) and ``n_card`` (how many were replaced).

    The point of the checksum gate: a bare 16-digit regex redacts
    order ids, tracking numbers and timestamps wholesale; the Luhn
    filter (which every real PAN satisfies by construction) keeps the
    false-positive rate at ~10% of digit runs instead of 100%. Shape:
    extract candidates (regexp_extract_all), validate with the native
    checksum, fold the valid ones through literal replace — one
    codegen pass, no shuffle, no Python."""
    cands = F.regexp_extract_all(F.col(text_col), F.lit(CARD_PATTERN), 0)
    valid = F.filter(
        cands, lambda c: luhn_valid(F.regexp_replace(c, "[ -]", ""))
    )
    return df.select(
        "*",
        F.aggregate(
            valid,
            F.col(text_col),
            lambda acc, c: F.replace(acc, c, F.lit("<CARD>")),
        ).alias("text_redacted"),
        F.size(valid).cast("long").alias("n_card"),
    )


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
