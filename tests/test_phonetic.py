"""Soundex — published test vectors (including the two rules most
implementations skip: H/W-bridged letters coded once, vowel-separated
letters coded twice), NULL policy, and the blocking-profile shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.link.phonetic import soundex, soundex_blocks

# (name, code) — the canonical vectors from the U.S. National Archives
# Soundex rules, plus classic sound-alike pairs.
VECTORS = [
    # H/W bridge: S and C both code 2, separated only by H -> coded once
    ("Ashcraft", "A261"),
    ("Ashcroft", "A261"),
    # Pf: both code 1, adjacent -> collapsed; first-letter slot suppressed
    ("Pfister", "P236"),
    # vowel-separated same-code letters are coded TWICE
    ("Tymczak", "T522"),
    ("Honeyman", "H555"),
    ("Robert", "R163"),
    ("Rupert", "R163"),
    ("Jackson", "J250"),
    ("Washington", "W252"),
    ("Gutierrez", "G362"),
    ("VanDeusen", "V532"),
    ("Lee", "L000"),
    ("Smith", "S530"),
    ("Smyth", "S530"),
    # non-letters stripped before coding
    ("O'Brien", "O165"),
    ("Mc-Donald", "M235"),
    # leading vowel is kept verbatim, its zero strips
    ("Aeiou", "A000"),
    # H/W as non-first letters are markers that simply drop
    ("HW", "H000"),
]


def _sx(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "name: string")
    rows = df.select(soundex(F.col("name")).alias("sx")).collect()
    return [r.sx for r in rows]


def test_published_vectors(spark):
    names = [n for n, _ in VECTORS]
    want = [c for _, c in VECTORS]
    assert _sx(spark, names) == want


def test_letterless_names_are_null(spark):
    assert _sx(spark, ["", "123", "  ", "'-'"]) == [None] * 4


def test_blocking_profile(spark):
    df = spark.createDataFrame(
        [(1, "Robert"), (2, "Rupert"), (3, "Robert"), (4, "Lee"), (5, "42")],
        "id: long, name: string",
    )
    got = {
        r["soundex"]: (r["n_rows"], r["n_distinct_names"])
        for r in soundex_blocks(df).collect()
    }
    # letterless row falls out; sound-alikes share a block
    assert got == {"R163": (3, 2), "L000": (1, 1)}
