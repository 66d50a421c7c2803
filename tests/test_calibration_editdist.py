"""Calibration audit + banded Levenshtein pairs: hand-computed values,
completeness vs brute force, and the top-bin fold."""

from __future__ import annotations

import itertools
import pytest

from spanluke_spark.evaluation.calibration import (
    expected_calibration_error,
    reliability_bins,
)
from spanluke_spark.link.editdist import levenshtein_pairs


def test_reliability_and_ece_hand_computed(spark):
    rows = [
        (0.05, False), (0.15, False), (0.15, True),   # bins 0, 1, 1
        (0.95, True), (0.95, True), (1.0, True),       # bin 9 (1.0 folds in)
    ]
    df = spark.createDataFrame(rows, "score double, label boolean")
    bins = {r.bin: r for r in reliability_bins(df, n_bins=10).collect()}
    assert bins[0].n == 1 and bins[0].pos_rate == 0.0
    assert bins[1].n == 2 and bins[1].pos_rate == 0.5
    assert bins[9].n == 3 and bins[9].pos_rate == 1.0
    e = expected_calibration_error(df, n_bins=10).collect()[0]
    expected = (
        1 * abs(0.05 - 0.0) + 2 * abs(0.15 - 0.5) + 3 * abs(round(2.9 / 3, 6) - 1.0)
    ) / 6
    assert e.n_total == 6 and e.ece == pytest.approx(round(expected, 6), abs=2e-6)


def test_perfectly_calibrated_ece_zero(spark):
    # each bin's mean score equals its positive rate exactly
    rows = [(0.25, True), (0.25, False), (0.25, False), (0.25, False),
            (0.75, True), (0.75, True), (0.75, True), (0.75, False)]
    df = spark.createDataFrame(rows, "score double, label boolean")
    assert expected_calibration_error(df, n_bins=4).collect()[0].ece == 0.0


def _lev(a, b):
    # textbook DP, for the brute-force check
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[len(b)]


def test_levenshtein_pairs_complete_vs_brute(spark):
    names = ["graph", "graphs", "grape", "grap", "table", "cable", "xyzzy",
             "graphite", "tble", "fable"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in levenshtein_pairs(df, d=2).collect()}
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 2
    }
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1  # graph/graphs
    assert not any(d > 2 for d in got.values())


def test_levenshtein_passjoin_random_with_short_strings(spark):
    import random

    rng = random.Random(5)
    alpha = "abcde"
    names = ["x", "ab", ""] + [
        "".join(rng.choice(alpha) for _ in range(rng.randint(3, 9)))
        for _ in range(60)
    ]
    names = [n for n in names if n]  # empty name dropped by caller contract
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in levenshtein_pairs(df, d=2).collect()}
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 2
    }
    assert got == want  # pigeonhole candidates + short lane are complete


def test_levenshtein_d1_and_probe_fanout_bound(spark):
    names = ["kitten", "sitten", "mitten", "kitchen", "sittin"]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = {(r.id_a, r.id_b): r.dist for r in levenshtein_pairs(df, d=1).collect()}
    want = {
        (i, j): _lev(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
        if _lev(a, b) <= 1
    }
    assert got == want
