"""Good-Turing missing mass and Monroe log-odds: hand-computed values and
directional sanity."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.textops.profile import log_odds_ratio, missing_mass


def test_missing_mass_hand_computed(spark):
    # tokens: a a a b b c d -> n=7, vocab=4, singletons {c,d}=2, doubles {b}=1
    df = spark.createDataFrame([("a a a b b c d",)], "text string")
    r = missing_mass(df).collect()[0]
    assert (r.n_tokens, r.vocab, r.n1, r.n2) == (7, 4, 2, 1)
    assert r.p_unseen == pytest.approx(round(2 / 7, 6))


def test_missing_mass_grouped(spark):
    df = spark.createDataFrame(
        [("en", "x y z"), ("en", "x"), ("de", "w w")],
        "lang string, text string",
    )
    got = {r.lang: r for r in missing_mass(df, group_col="lang").collect()}
    assert got["en"].n1 == 2 and got["en"].p_unseen == 0.5  # y, z of 4
    assert got["de"].n1 == 0 and got["de"].p_unseen == 0.0


def test_log_odds_direction_and_z(spark):
    rows = [("A", "apple apple apple shared shared")] * 4 + [
        ("B", "banana banana banana shared shared")
    ] * 4
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r.term: r for r in
           log_odds_ratio(df, "source", "A", "B", min_count=5).collect()}
    assert got["apple"].delta > 0 and got["apple"].z > 0   # A-distinctive
    assert got["banana"].delta < 0 and got["banana"].z < 0
    assert abs(got["shared"].z) < abs(got["apple"].z)      # balanced term
    # hand-check one delta
    r = got["apple"]
    n_a = 12 + 8
    n_b = 12 + 8
    a_w, a0 = 0.01 * 12, 0.01 * (12 + 12 + 16)
    d = math.log((12 + a_w) / (n_a + a0 - 12 - a_w)) - math.log(
        (0 + a_w) / (n_b + a0 - 0 - a_w)
    )
    assert r.delta == pytest.approx(round(d, 6), abs=2e-6)
