"""Luhn card-number PII lane (textops/pii.py) gates: published
ISO/IEC 7812 / network test-card anchors, fuzz parity with a Python
reference checksum, and the redact path replayed in Python on
hand-written multi-card texts (valid cards masked, Luhn-invalid digit
runs left alone — the false-positive killer a bare regex lacks)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from spanluke_spark.textops.pii import (
    CARD_PATTERN,
    luhn_checksum,
    luhn_valid,
    redact_card_numbers,
)


def py_luhn(digits: str) -> int:
    total = 0
    for j, ch in enumerate(reversed(digits)):
        d = int(ch)
        if j % 2 == 0:
            total += d
        else:
            total += 2 * d - 9 if d > 4 else 2 * d
    return total % 10


# The canonical network test PANs every payment-stack testsuite pins.
VALID_ANCHORS = [
    "4111111111111111",   # Visa
    "378282246310005",    # American Express (15 digits)
    "6011111111111117",   # Discover
    "5555555555554444",   # Mastercard
]
INVALID_ANCHORS = ["4111111111111112", "1234567890123456"]


def test_python_reference_agrees_with_published_anchors():
    for s in VALID_ANCHORS:
        assert py_luhn(s) == 0, s
    for s in INVALID_ANCHORS:
        assert py_luhn(s) != 0, s


def test_spark_checksum_parity(spark):
    fuzz = ["".join(str((i * k * 7919) % 10) for k in range(1, 14 + i % 6)) for i in range(60)]
    all_cases = VALID_ANCHORS + INVALID_ANCHORS + fuzz
    df = spark.createDataFrame([(i, s) for i, s in enumerate(all_cases)], "i int, d string")
    got = {
        r["i"]: (r["m"], r["v"])
        for r in df.select(
            "i",
            luhn_checksum(F.col("d")).alias("m"),
            luhn_valid(F.col("d")).alias("v"),
        ).collect()
    }
    for i, s in enumerate(all_cases):
        assert got[i][0] == py_luhn(s), s
        assert got[i][1] == (13 <= len(s) <= 19 and py_luhn(s) == 0), s


def py_redact(text: str) -> tuple[str, int]:
    out, n = text, 0
    for cand in re.findall(r"\b\d(?:[ -]?\d){12,18}\b", text):
        digits = re.sub(r"[ -]", "", cand)
        if 13 <= len(digits) <= 19 and py_luhn(digits) == 0:
            out = out.replace(cand, "<CARD>")
            n += 1
    return out, n


def test_redact_card_numbers_matches_python_replay(spark):
    texts = [
        "pay 4111 1111 1111-1111 or 5555555555554444 today",  # two valid
        "order 1234567890123456 shipped",                      # invalid run
        "amex 3782-8224 6310-005 works",                       # valid, mixed seps
        "ip 10.0.0.1 and year 2024 stay",                      # no candidates
        "visa 4111111111111111 twice 4111111111111111",        # duplicate
        "short 123456789012 too short",                        # 12 digits: no match
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: (r["text_redacted"], r["n_card"])
        for r in redact_card_numbers(df, "text").collect()
    }
    for i, t in enumerate(texts):
        want_text, _ = py_redact(t)
        assert got[i][0] == want_text, (t, got[i][0])
    # spot-checks on the semantics the replay proves
    assert got[0] == ("pay <CARD> or <CARD> today", 2)
    assert got[1] == ("order 1234567890123456 shipped", 0)
    assert got[2][1] == 1 and "<CARD>" in got[2][0]
    assert got[3] == ("ip 10.0.0.1 and year 2024 stay", 0)
    assert got[4][0] == "visa <CARD> twice <CARD>"
    assert got[5][1] == 0


def test_card_pattern_is_re2_safe():
    # no lookaround — the oracle replays the same pattern in DuckDB/RE2
    assert "(?<" not in CARD_PATTERN and "(?=" not in CARD_PATTERN and "(?!" not in CARD_PATTERN
