"""Copeland rank aggregation — Condorcet-winner guarantee, brute-force
Python parity, partial-ranking semantics, tie accounting."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F  # noqa: F401 (fixture building)

from spanluke_spark.textops.retrieval import copeland


def _py_copeland(rows):
    by_ranker = {}
    for r, item, rank in rows:
        by_ranker.setdefault(r, {})[item] = rank
    items = sorted({item for _, item, _ in rows})
    wins = {i: 0 for i in items}
    losses = {i: 0 for i in items}
    for a, b in itertools.combinations(items, 2):
        wa = wb = 0
        for ranking in by_ranker.values():
            if a in ranking and b in ranking:
                if ranking[a] < ranking[b]:
                    wa += 1
                elif ranking[b] < ranking[a]:
                    wb += 1
        if wa > wb:
            wins[a] += 1
            losses[b] += 1
        elif wb > wa:
            wins[b] += 1
            losses[a] += 1
    return {
        i: (wins[i], losses[i], wins[i] - losses[i]) for i in items
    }


def _spark_copeland(spark, rows):
    df = spark.createDataFrame(rows, "ranker: long, item: long, rank: long")
    return {
        r["item"]: (r["wins"], r["losses"], r["copeland"])
        for r in copeland(df).collect()
    }


def test_python_parity_full_rankings(spark):
    rng = random.Random(23)
    rows = []
    for r in range(5):
        perm = list(range(8))
        rng.shuffle(perm)
        rows += [(r, item, rank) for rank, item in enumerate(perm)]
    assert _spark_copeland(spark, rows) == _py_copeland(rows)


def test_condorcet_winner_tops(spark):
    # item 0 is ranked first by 2 of 3 rankers -> beats everyone
    rows = []
    for r, perm in enumerate([[0, 1, 2, 3], [0, 2, 3, 1], [3, 0, 1, 2]]):
        rows += [(r, item, rank) for rank, item in enumerate(perm)]
    got = _spark_copeland(spark, rows)
    assert got[0] == (3, 0, 3)  # beat all 3 opponents
    assert max(got, key=lambda i: got[i][2]) == 0


def test_partial_rankings_duel_only_where_both_ranked(spark):
    rows = [(0, 1, 0), (0, 2, 1), (1, 2, 0), (1, 3, 1)]
    got = _spark_copeland(spark, rows)
    assert got == _py_copeland(rows)
    # 1 vs 3 never co-ranked -> no duel between them
    assert got[1] == (1, 0, 1)  # only the duel with 2
    assert got[3] == (0, 1, -1)  # only the duel with 2


def test_exact_tie_scores_zero(spark):
    rows = [(0, 1, 0), (0, 2, 1), (1, 2, 0), (1, 1, 1)]
    got = _spark_copeland(spark, rows)
    assert got[1] == (0, 0, 0) and got[2] == (0, 0, 0)
