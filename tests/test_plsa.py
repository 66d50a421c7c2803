"""PLSA fixed-point EM — pure-Python replay parity (the quantized
trajectory must match bit-for-bit), distribution invariants (row sums),
planted two-topic separation, and likelihood improvement over init."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest

from spanluke_spark.textops.topics import plsa_topics

QUANT = 1 << 20


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _mass(key, z):
    return 1 + _h(f"{key}:{z}") % 7


def _py_plsa(counts, k=3, rounds=4):
    """counts: list of (d, w, n). Returns (pwz, pzd) dicts."""
    docs = sorted({d for d, _, _ in counts})
    words = sorted({w for _, w, _ in counts})
    pzd = {}
    for d in docs:
        ms = [_mass(d, z) for z in range(1, k + 1)]
        tot = sum(ms)
        pzd[d] = [m / tot for m in ms]
    wmass = {w: [_mass(w, z) for z in range(1, k + 1)] for w in words}
    tz = [sum(wmass[w][i] for w in words) for i in range(k)]
    pwz = {w: [wmass[w][i] / tz[i] for i in range(k)] for w in words}
    for _ in range(rounds):
        a = {}
        for d, w, n in counts:
            prods = [pzd[d][i] * pwz[w][i] for i in range(k)]
            den = prods[0]
            for p in prods[1:]:
                den += p
            a[(d, w)] = [
                int(round_half_up(n * (prods[i] / den) * QUANT)) for i in range(k)
            ]
        ds = defaultdict(lambda: [0] * k)
        ws = defaultdict(lambda: [0] * k)
        for (d, w), az in a.items():
            for i in range(k):
                ds[d][i] += az[i]
                ws[w][i] += az[i]
        pzd = {}
        for d in docs:
            s = [ds[d][i] + 1 for i in range(k)]
            tot = sum(s)
            pzd[d] = [x / tot for x in s]
        tz = [sum(ws[w][i] for w in words) + len(words) for i in range(k)]
        pwz = {w: [(ws[w][i] + 1) / tz[i] for i in range(k)] for w in words}
    return pwz, pzd


def round_half_up(x: float) -> float:
    f = math.floor(x)
    return f + 1.0 if x - f >= 0.5 else float(f)


def _spark_plsa(spark, counts, k=3, rounds=4):
    df = spark.createDataFrame(counts, "d: long, w: string, n: long")
    pwz, pzd = plsa_topics(df, k=k, rounds=rounds)
    got_w = {r["w"]: [r[f"q{z}"] for z in range(1, k + 1)] for r in pwz.collect()}
    got_d = {r["d"]: [r[f"p{z}"] for z in range(1, k + 1)] for r in pzd.collect()}
    return got_w, got_d


def _toy_corpus():
    # two disjoint vocabularies: docs 0-4 use only A-words, 5-9 only B-words
    counts = []
    for d in range(5):
        for j, w in enumerate(["alpha", "beta", "gamma"]):
            counts.append((d, w, 3 + (d + j) % 4))
    for d in range(5, 10):
        for j, w in enumerate(["delta", "epsilon", "zeta"]):
            counts.append((d, w, 3 + (d + j) % 4))
    return counts


def test_python_replay_parity(spark):
    counts = _toy_corpus()
    got_w, got_d = _spark_plsa(spark, counts)
    want_w, want_d = _py_plsa(counts)
    for w, qs in want_w.items():
        assert got_w[w] == pytest.approx(qs, abs=1e-12), w
    for d, ps in want_d.items():
        assert got_d[d] == pytest.approx(ps, abs=1e-12), d


def test_distributions_sum_to_one(spark):
    got_w, got_d = _spark_plsa(spark, _toy_corpus())
    for ps in got_d.values():
        assert sum(ps) == pytest.approx(1.0, abs=1e-9)
    for z in range(3):
        assert sum(qs[z] for qs in got_w.values()) == pytest.approx(1.0, abs=1e-9)


def test_planted_topics_separate(spark):
    # K=2 on a two-vocabulary corpus: each group must concentrate on its
    # own topic (with K>2 the spare topic legitimately splits one group)
    got_w, got_d = _spark_plsa(spark, _toy_corpus(), k=2, rounds=12)
    a_top = {max(range(2), key=lambda z: got_d[d][z]) for d in range(5)}
    b_top = {max(range(2), key=lambda z: got_d[d][z]) for d in range(5, 10)}
    assert a_top.isdisjoint(b_top)
    for d in range(10):
        assert max(got_d[d]) > 0.9, d
    # word distributions: A-words carry no mass in B's topic and vice versa
    (a_z,) = a_top
    (b_z,) = b_top
    for w in ("alpha", "beta", "gamma"):
        assert got_w[w][a_z] > 0.1 and got_w[w][b_z] < 0.01
    for w in ("delta", "epsilon", "zeta"):
        assert got_w[w][b_z] > 0.1 and got_w[w][a_z] < 0.01


def test_em_improves_likelihood(spark):
    counts = _toy_corpus()

    def loglik(pwz, pzd):
        return sum(
            n * math.log(sum(pzd[d][z] * pwz[w][z] for z in range(3)))
            for d, w, n in counts
        )

    w0, d0 = _py_plsa(counts, rounds=0)
    w4, d4 = _spark_plsa(spark, counts, rounds=4)
    assert loglik(w4, d4) > loglik(w0, d0)
