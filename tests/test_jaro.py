"""Jaro-Winkler (link/jaro.py) and chi-squared contingency
(evaluation/contingency.py) parity tests.

The JW gates: (a) published Winkler-1990 vectors (the anchors every
mainstream implementation reproduces), (b) agreement with DuckDB's
independent built-in across a 400-pair deterministic fuzz sweep
including window-edge and empty/equal degenerate shapes, (c) fixture
blocking recall vs the unblocked brute force, (d) the q280 threshold
margin (no fixture pair sits near 0.90, so a ulp wobble can never flip
the oracle row set)."""

from __future__ import annotations

import itertools

import duckdb
import pytest
from pyspark.sql import functions as F

from spanluke_spark.link.jaro import (
    jaro_similarity,
    jaro_winkler_similarity,
    jaro_winkler_pairs,
)

PUBLISHED = [
    # (s1, s2, jaro, jaro_winkler) — Winkler 1990 / standard test vectors
    ("MARTHA", "MARHTA", 0.9444444444, 0.9611111111),
    ("DIXON", "DICKSONX", 0.7666666667, 0.8133333333),
    ("DWAYNE", "DUANE", 0.8222222222, 0.8400000000),
    ("JONES", "JOHNSON", 0.7904761905, 0.8323809524),
    ("SHACKLEFORD", "SHACKELFORD", 0.9696969697, 0.9818181818),
]


def _fuzz_pairs():
    """Deterministic adversarial strings: repeated alphabets (window
    collisions), shared prefixes (boost paths), rotations (transposition
    extremes), length skews, empties."""
    alphabet = "abcde"
    words = []
    for n in (0, 1, 2, 3, 5, 8, 13):
        words.append(alphabet * (n // 5 + 1))
        words.append("".join(alphabet[(i * 3 + n) % 5] for i in range(n)))
        words.append("ab" + "z" * n)
        words.append(("abcdefgh"[: max(n, 1)])[::-1])
    words = list(dict.fromkeys(words))[:20]
    return list(itertools.product(words, words))


def test_published_vectors(spark):
    df = spark.createDataFrame(
        [(a, b) for a, b, _, _ in PUBLISHED], "s1 string, s2 string"
    )
    got = {
        (r.s1, r.s2): (r.j, r.jw)
        for r in df.select(
            "s1",
            "s2",
            jaro_similarity(F.col("s1"), F.col("s2")).alias("j"),
            jaro_winkler_similarity(F.col("s1"), F.col("s2")).alias("jw"),
        ).collect()
    }
    for s1, s2, ej, ejw in PUBLISHED:
        j, jw = got[(s1, s2)]
        assert j == pytest.approx(ej, abs=1e-9)
        assert jw == pytest.approx(ejw, abs=1e-9)


def test_degenerate_conventions(spark):
    """Empty -> 0.0 (DuckDB convention), identical -> 1.0, below-boost
    pairs get NO prefix bonus."""
    rows = spark.createDataFrame(
        [("", ""), ("a", ""), ("aaaa", "aaaa"), ("abcdef", "abzzzz")],
        "s1 string, s2 string",
    ).select(
        "s1", "s2", jaro_winkler_similarity(F.col("s1"), F.col("s2")).alias("jw")
    ).collect()
    vals = {(r.s1, r.s2): r.jw for r in rows}
    assert vals[("", "")] == 0.0
    assert vals[("a", "")] == 0.0
    assert vals[("aaaa", "aaaa")] == 1.0
    # jaro = 0.5556 < 0.7 boost threshold: stays un-boosted despite 'ab' prefix
    assert vals[("abcdef", "abzzzz")] == pytest.approx(5.0 / 9.0, abs=1e-9)


def test_duckdb_agreement_fuzz(spark):
    pairs = _fuzz_pairs()
    df = spark.createDataFrame(pairs, "s1 string, s2 string")
    got = df.select(
        "s1",
        "s2",
        jaro_similarity(F.col("s1"), F.col("s2")).alias("j"),
        jaro_winkler_similarity(F.col("s1"), F.col("s2")).alias("jw"),
    ).collect()
    con = duckdb.connect()
    for r in got:
        dj, djw = con.execute(
            "SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
            [r.s1, r.s2, r.s1, r.s2],
        ).fetchone()
        assert r.j == pytest.approx(dj, abs=1e-12), (r.s1, r.s2)
        assert r.jw == pytest.approx(djw, abs=1e-12), (r.s1, r.s2)


def test_fixture_blocking_recall_and_margin(spark):
    """On the q280 fixture the prefix+band block loses nothing vs the
    unblocked brute force, and no pair sits within 1e-3 of the 0.90
    threshold (oracle row set cannot flip on a float ulp)."""
    import __spark_entry__ as entrymod

    names = entrymod._JW_NAMES
    con = duckdb.connect()
    brute, margin = [], 1.0
    for a, b in itertools.combinations(range(60), 2):
        jw = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [names[a], names[b]]
        ).fetchone()[0]
        margin = min(margin, abs(jw - 0.90))
        if jw >= 0.90:
            brute.append((a, b))
    assert margin > 1e-3
    df = spark.createDataFrame(
        [(k, names[k]) for k in range(60)], "id long, name string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in jaro_winkler_pairs(df, threshold=0.90).collect()
    }
    assert got == set(brute)  # 116 pairs, zero blocking loss here


def test_chi_squared_known_table(spark):
    """2x2 closed form: chi2 = N(ad-bc)^2 / (r1 r2 c1 c2) on a textbook
    table (a=10 b=20 / c=30 d=5): chi2 = 65*(50-600)^2/(30*35*40*25)
    = 18.7261904..., V = sqrt(chi2/65)."""
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20 + [("y", "u")] * 30 + [("y", "v")] * 5
    )
    df = spark.createDataFrame(rows, "r string, c string")
    from spanluke_spark.evaluation.contingency import chi_squared_independence

    out = chi_squared_independence(df, "r", "c").collect()
    assert len(out) == 4
    expected = 65 * (10 * 5 - 20 * 30) ** 2 / (30 * 35 * 40 * 25)
    got = out[0].chi2_ppm / 1e6
    assert got == pytest.approx(expected, abs=5e-6)
    assert out[0].dof == 1
    assert out[0].cramers_v == pytest.approx(
        (expected / 65) ** 0.5, abs=5e-6
    )


def test_chi_squared_independent_table_is_zero(spark):
    """A perfectly independent table (every cell = r*c/N exactly) has
    chi2 = 0 in every cell."""
    rows = []
    for r, mult_r in (("a", 1), ("b", 2)):
        for c, mult_c in (("u", 1), ("v", 3)):
            rows += [(r, c)] * (10 * mult_r * mult_c)
    df = spark.createDataFrame(rows, "r string, c string")
    from spanluke_spark.evaluation.contingency import chi_squared_independence

    out = chi_squared_independence(df, "r", "c").collect()
    assert all(x.cell_chi2_ppm == 0 for x in out)
    assert all(x.chi2_ppm == 0 for x in out)
    assert all(x.cramers_v == 0.0 for x in out)
