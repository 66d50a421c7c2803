"""SALSA closed form (graph/salsa.py) and absorbing hitting probability
(graph/hitting.py) definitional gates.

SALSA: the closed form must BE the stationary distribution of the
published two-step chain — verified by building the authority-side
transition matrix in numpy and checking pi @ P == pi, plus the
component-share mass split and the exact-rational carry. Hitting:
hand-computable chains, absorbing/dangling contracts, and numpy
float-value-iteration parity within the stated floor-quantization bias.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spanluke_spark.graph.hitting import hitting_probability
from spanluke_spark.graph.salsa import salsa_scores


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- SALSA

# two components: {1,2,3 -> 10,11} and {5 -> 20, 6 -> 20}
SALSA_EDGES = [
    (1, 10), (1, 11), (2, 10), (3, 10), (3, 11),
    (5, 20), (6, 20),
]


def test_salsa_matches_numpy_stationary(spark):
    out = salsa_scores(_edges_df(spark, SALSA_EDGES)).collect()
    auth = {r.node: r for r in out if r.side == "authority"}
    hubs = {r.node: r for r in out if r.side == "hub"}

    # --- authority chain: j -> uniform in-hub -> uniform out-authority
    a_nodes = sorted(auth)
    hubs_out = {}
    in_hubs = {j: [] for j in a_nodes}
    for s, d in SALSA_EDGES:
        hubs_out.setdefault(s, []).append(d)
        in_hubs[d].append(s)
    P = np.zeros((len(a_nodes), len(a_nodes)))
    idx = {j: i for i, j in enumerate(a_nodes)}
    for j in a_nodes:
        for h in in_hubs[j]:
            for j2 in hubs_out[h]:
                P[idx[j], idx[j2]] += (1 / len(in_hubs[j])) * (
                    1 / len(hubs_out[h])
                )
    pi = np.array(
        [auth[j].score_num / auth[j].score_den for j in a_nodes]
    )
    assert pi.sum() == pytest.approx(1.0, abs=1e-12)
    assert np.allclose(pi @ P, pi, atol=1e-12)  # stationarity


def test_salsa_closed_form_values(spark):
    """Hand numbers: |A| = 3 (10, 11, 20). Component of 10/11 has 2
    authorities with in-degrees 3 and 2 (sum 5); component of 20 has 1
    authority, in-degree 2. a(10) = (2/3)(3/5) = 2/5, a(11) = (2/3)(2/5)
    = 4/15, a(20) = 1/3. Hubs |H| = 5: comp{1,2,3} out-deg 2,1,2 (sum
    5): h(1) = (3/5)(2/5) = 6/25; comp{5,6}: h(5) = (2/5)(1/2) = 1/5."""
    out = salsa_scores(_edges_df(spark, SALSA_EDGES)).collect()
    got = {(r.side, r.node): (r.score_num, r.score_den) for r in out}

    def frac(side, node):
        n, d = got[(side, node)]
        return n / d

    assert frac("authority", 10) == pytest.approx(2 / 5)
    assert frac("authority", 11) == pytest.approx(4 / 15)
    assert frac("authority", 20) == pytest.approx(1 / 3)
    assert frac("hub", 1) == pytest.approx(6 / 25)
    assert frac("hub", 2) == pytest.approx(3 / 25)
    assert frac("hub", 3) == pytest.approx(6 / 25)
    assert frac("hub", 5) == pytest.approx(1 / 5)
    assert frac("hub", 6) == pytest.approx(1 / 5)
    # each side sums to 1 exactly (rationals)
    for side in ("hub", "authority"):
        tot = sum(
            n / d for (s, _), (n, d) in got.items() if s == side
        )
        assert tot == pytest.approx(1.0, abs=1e-12)


def test_salsa_components_are_bipartite_not_sidewise(spark):
    """1->10, 2->10, 2->11: hubs 1 and 2 share NO direct edge but sit in
    one component via authority 10 — the component must span the
    bipartite support graph, not either side alone."""
    out = salsa_scores(_edges_df(spark, [(1, 10), (2, 10), (2, 11)])).collect()
    comps = {r.comp for r in out}
    assert len(comps) == 1


# -------------------------------------------------------------- hitting

def test_hitting_chain(spark):
    """0 -> 1 -> 2(target): p after 1 round = (0, 1, 1); after 2 rounds
    node 0 reaches too. Dangling node 3 stays at 0."""
    e = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    t = spark.createDataFrame([(2,)], "node long")
    got1 = {
        r.node: r.p_ppm
        for r in hitting_probability(e, t, rounds=1).collect()
    }
    assert got1 == {0: 0, 1: 10**6, 2: 10**6, 3: 0}
    got2 = {
        r.node: r.p_ppm
        for r in hitting_probability(e, t, rounds=2).collect()
    }
    assert got2 == {0: 10**6, 1: 10**6, 2: 10**6, 3: 0}


def test_hitting_split_and_floor(spark):
    """0 branches to a target and a dead end: exactly 500000. A 3-way
    branch with one target floors 1000000/3 to 333333."""
    e = _edges_df(spark, [(0, 1), (0, 2), (5, 6), (5, 7), (5, 8)])
    t = spark.createDataFrame([(1,), (6,)], "node long")
    got = {
        r.node: r.p_ppm
        for r in hitting_probability(e, t, rounds=1).collect()
    }
    assert got[0] == 500000
    assert got[5] == 333333


def test_hitting_numpy_parity_fixture(spark, sf_dir):
    """On the q282 fixture graph the quantized iteration tracks exact
    float value iteration within rounds * 1 ppm (floor bias bound)."""
    import __spark_entry__ as entrymod

    edges = entrymod._crawl_graph_100(spark, sf_dir)
    pairs = {(r.src, r.dst) for r in edges.distinct().collect()}
    targets = {n for n in range(100) if n % 17 == 0}
    out_n = {}
    for s, d in pairs:
        out_n.setdefault(s, []).append(d)
    rounds = 5
    p = {n: 1.0 if n in targets else 0.0 for n in range(100)}
    for _ in range(rounds):
        p = {
            n: 1.0
            if n in targets
            else (
                sum(p[v] for v in out_n[n]) / len(out_n[n])
                if out_n.get(n)
                else 0.0
            )
            for n in range(100)
        }
    t_df = spark.createDataFrame([(n,) for n in targets], "node long")
    got = {
        r.node: r.p_ppm
        for r in hitting_probability(edges, t_df, rounds=rounds).collect()
    }
    for n in range(100):
        assert abs(got[n] / 1e6 - p[n]) <= rounds * 1e-6 + 1e-12, n
