"""Greedy set cover — Python greedy parity on random instances, the
early-stop contract when everything is covered, tie determinism, and
the coverage-monotonicity invariant."""

from __future__ import annotations

import random
from collections import defaultdict

from spanluke_spark.textops.setcover import greedy_set_cover


def _py_greedy(pairs, k):
    sets = defaultdict(set)
    for s, e in pairs:
        sets[s].add(e)
    covered: set = set()
    out = []
    total = 0
    for rnd in range(1, k + 1):
        best = None
        for s in sorted(sets):
            gain = len(sets[s] - covered)
            if gain > 0 and (best is None or gain > best[1]):
                best = (s, gain)
        if best is None:
            break
        covered |= sets[best[0]]
        total += best[1]
        out.append((rnd, best[0], best[1], total))
    return out


def _spark_cover(spark, pairs, k):
    df = spark.createDataFrame(pairs, "doc_id: long, entity: string")
    return [
        (r["round"], r["doc_id"], r["new_covered"], r["total_covered"])
        for r in greedy_set_cover(df, k=k).orderBy("round").collect()
    ]


def test_matches_python_greedy(spark):
    for seed in (1, 6):
        rng = random.Random(seed)
        pairs = list(
            {
                (rng.randrange(15), f"e{rng.randrange(30)}")
                for _ in range(120)
            }
        )
        assert _spark_cover(spark, pairs, 6) == _py_greedy(pairs, 6)


def test_early_stop_when_universe_covered(spark):
    pairs = [(0, "a"), (0, "b"), (1, "b"), (1, "c")]
    got = _spark_cover(spark, pairs, 10)
    assert len(got) == 2
    assert got[-1][3] == 3  # a, b, c all covered


def test_tie_breaks_to_smallest_set_id(spark):
    pairs = [(5, "x"), (5, "y"), (2, "p"), (2, "q")]
    got = _spark_cover(spark, pairs, 1)
    assert got[0][1] == 2


def test_coverage_monotone_and_gains_nonincreasing(spark):
    rng = random.Random(9)
    pairs = list(
        {(rng.randrange(12), f"e{rng.randrange(25)}") for _ in range(90)}
    )
    got = _spark_cover(spark, pairs, 8)
    gains = [g for _, _, g, _ in got]
    assert gains == sorted(gains, reverse=True)  # greedy is monotone
    totals = [t for *_, t in got]
    assert totals == sorted(totals)
