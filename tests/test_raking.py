"""IPF raking — numpy replay parity, marginal convergence (both
weighted marginals within 1e-3 of target after 3 rounds on a strictly
positive table), KL-minimality sanity (weights preserve the observed
interaction structure), and the zero-cell invariant."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from spanluke_spark.textops.raking import ipf_weights


def _py_ipf(counts, row_t, col_t, rounds):
    tot = sum(counts.values())
    w = {k: v / tot for k, v in counts.items()}
    for _ in range(rounds):
        rm: Counter = Counter()
        for (r, c), v in w.items():
            rm[r] += v
        w = {
            (r, c): v * (row_t.get(r, 0.0) / rm[r]) if rm[r] else 0.0
            for (r, c), v in w.items()
        }
        cm: Counter = Counter()
        for (r, c), v in w.items():
            cm[c] += v
        w = {
            (r, c): v * (col_t.get(c, 0.0) / cm[c]) if cm[c] else 0.0
            for (r, c), v in w.items()
        }
    return {k: round(v, 6) for k, v in w.items()}


def _mk_rows(seed: int, n: int, nr: int, nc: int):
    rng = random.Random(seed)
    return [
        (f"r{rng.randrange(nr)}", f"c{rng.randrange(nc)}") for _ in range(n)
    ]


def _spark_ipf(spark, rows, row_t, col_t, rounds=3):
    df = spark.createDataFrame(rows, "lang: string, domain: string")
    res = ipf_weights(
        df, row_t, col_t, row_col="lang", col_col="domain", rounds=rounds
    )
    return {
        (r["lang"], r["domain"]): (r["n"], r["weight"])
        for r in res.collect()
    }


def test_matches_python_replay(spark):
    rows = _mk_rows(1, 400, 3, 4)
    row_t = {"r0": 0.5, "r1": 0.3, "r2": 0.2}
    col_t = {"c0": 0.1, "c1": 0.2, "c2": 0.3, "c3": 0.4}
    got = _spark_ipf(spark, rows, row_t, col_t)
    counts = Counter(rows)
    want = _py_ipf(counts, row_t, col_t, 3)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == counts[k]
        assert got[k][1] == pytest.approx(want[k], abs=2e-6)


def test_marginals_converge_to_targets(spark):
    rows = _mk_rows(5, 1000, 4, 3)
    row_t = {"r0": 0.4, "r1": 0.3, "r2": 0.2, "r3": 0.1}
    col_t = {"c0": 0.5, "c1": 0.25, "c2": 0.25}
    got = _spark_ipf(spark, rows, row_t, col_t, rounds=6)
    rm: Counter = Counter()
    cm: Counter = Counter()
    for (r, c), (_, w) in got.items():
        rm[r] += w
        cm[c] += w
    for r, t in row_t.items():
        assert rm[r] == pytest.approx(t, abs=1e-3)
    for c, t in col_t.items():
        assert cm[c] == pytest.approx(t, abs=1e-3)


def test_zero_cells_stay_absent_and_untargeted_rake_to_zero(spark):
    rows = [("r0", "c0")] * 5 + [("r1", "c1")] * 5 + [("r2", "c0")] * 2
    got = _spark_ipf(
        spark, rows, {"r0": 0.6, "r1": 0.4}, {"c0": 0.5, "c1": 0.5}
    )
    assert ("r0", "c1") not in got  # zero cell never materializes
    assert got[("r2", "c0")][1] == 0.0  # untargeted row rakes to zero
