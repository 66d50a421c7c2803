"""Successive elimination (etl/bandit.py) and Bradley-Terry MM
(evaluation/preference.py) definitional gates: hand-computable
eliminations, the safe-elimination property (the true best arm on a
well-separated fixture is never killed), python-Fraction MM replay
parity, float-MM fixpoint tracking, and planted-ranking recovery."""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from spanluke_spark.etl.bandit import successive_elimination
from spanluke_spark.evaluation.preference import bradley_terry


def _pulls(spark, rows):
    return spark.createDataFrame(rows, "arm string, round long, reward long")


def test_bandit_hand_elimination(spark):
    """Two arms, 4 pulls each in round 0: means 900 vs 100 permille.
    gap = 800000 ppm, gap^2 * 4 >> 4 * 50000^2 -> 'lo' eliminated in
    round 0; round 1 has only the leader left."""
    rows = [("hi", 0, 900)] * 4 + [("lo", 0, 100)] * 4 + [
        ("hi", 1, 900),
        ("lo", 1, 100),  # never reached: lo is dead
    ]
    out = successive_elimination(_pulls(spark, rows), rounds=2).collect()
    r0 = {r.arm: r for r in out if r.round == 0}
    assert r0["hi"].is_leader and not r0["hi"].eliminated
    assert r0["lo"].eliminated and r0["lo"].mean_ppm == 100000
    r1 = {r.arm: r for r in out if r.round == 1}
    assert set(r1) == {"hi"}
    assert r1["hi"].n == 5  # kept accumulating


def test_bandit_close_arms_survive(spark):
    """Means 500 vs 520 permille with tiny n: gap^2 * n below the
    radius -> nobody eliminated (the test is conservative)."""
    rows = [("a", 0, 500)] * 3 + [("b", 0, 520)] * 3
    out = successive_elimination(_pulls(spark, rows), rounds=1).collect()
    assert not any(r.eliminated for r in out)
    # 20000^2 * 3 = 1.2e9 < 4 * 50000^2 = 1e10
    lead = [r for r in out if r.is_leader]
    assert len(lead) == 1 and lead[0].arm == "b"


def test_bandit_best_arm_never_killed_fixture(spark, sf_dir):
    """On the q284 planted fixture the max-mean arm (src19) survives all
    rounds and eliminations are monotone (dead arms stay out)."""
    import __spark_entry__ as entrymod

    out = entrymod.q284_source_bandit(spark, sf_dir).collect()
    by_round = {}
    for r in out:
        by_round.setdefault(r.round, {})[r.arm] = r
    alive = set(by_round[0])
    for t in sorted(by_round):
        assert set(by_round[t]) == alive  # only previously-alive arms
        assert "src19" in alive and not by_round[t]["src19"].eliminated
        alive -= {a for a, r in by_round[t].items() if r.eliminated}
    assert len(alive) < len(by_round[0])  # pressure actually eliminates


def _mm_fraction_replay(duel_rows, rounds, scale=10**6):
    """Pure-python integer replay of the quantized MM recurrence."""
    pairs, wins, games = {}, {}, {}
    for w, l in duel_rows:
        i, j = min(w, l), max(w, l)
        pairs[(i, j)] = pairs.get((i, j), 0) + 1
        wins[w] = wins.get(w, 0) + 1
        games[w] = games.get(w, 0) + 1
        games[l] = games.get(l, 0) + 1
    items = sorted(games)
    p = {i: scale for i in items}
    for _ in range(rounds):
        s = {i: 0 for i in items}
        for (i, j), n in pairs.items():
            t = n * 10**12 // (p[i] + p[j])
            s[i] += t
            s[j] += t
        raw = {i: wins.get(i, 0) * 10**12 // s[i] for i in items}
        tot = sum(raw.values())
        p = {i: raw[i] * len(items) * scale // tot for i in items}
    return p, wins, games


DUELS = (
    [(1, 0)] * 6 + [(0, 1)] * 2
    + [(2, 1)] * 5 + [(1, 2)] * 2
    + [(2, 0)] * 7 + [(0, 2)] * 1
)


def test_bt_fraction_replay_parity(spark):
    df = spark.createDataFrame(DUELS, "winner long, loser long")
    got = {r.item: r for r in bradley_terry(df, rounds=4).collect()}
    exp, wins, games = _mm_fraction_replay(DUELS, rounds=4)
    for i in exp:
        assert got[i].strength_ppm == exp[i]
        assert got[i].wins == wins.get(i, 0)
        assert got[i].games == games[i]


def test_bt_tracks_float_mm_fixpoint(spark):
    """Quantized 12-round strengths approach the exact float MM
    fixpoint (normalized the same way) within ~1e-3 relative."""
    df = spark.createDataFrame(DUELS, "winner long, loser long")
    got = {
        r.item: r.strength_ppm / 1e6
        for r in bradley_terry(df, rounds=12).collect()
    }
    # exact float MM to convergence
    pairs = {(0, 1): 8, (1, 2): 7, (0, 2): 8}
    wins = {0: 3, 1: 8, 2: 12}
    p = {0: 1.0, 1: 1.0, 2: 1.0}
    for _ in range(300):
        s = {i: 0.0 for i in p}
        for (i, j), n in pairs.items():
            s[i] += n / (p[i] + p[j])
            s[j] += n / (p[i] + p[j])
        p = {i: wins[i] / s[i] for i in p}
        tot = sum(p.values())
        p = {i: 3 * v / tot for i, v in p.items()}
    for i in p:
        assert got[i] == pytest.approx(p[i], rel=2e-3)


def test_bt_planted_ranking_recovered(spark, sf_dir):
    """q285's planted P(a beats b) = 0.5 + 0.035(a-b) must produce
    monotone strengths in the item index, every item with >= 1 win."""
    import __spark_entry__ as entrymod

    out = entrymod.q285_bradley_terry(spark, sf_dir).collect()
    assert len(out) == 8
    assert all(r.wins >= 1 for r in out)
    strengths = [r.strength_ppm for r in sorted(out, key=lambda r: r.item)]
    assert strengths == sorted(strengths)
