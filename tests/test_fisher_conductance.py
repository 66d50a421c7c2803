"""Gates for Fisher's exact test (evaluation/fisher.py) and
per-community conductance (graph/conductance.py): Fisher against an
exact math.comb/Fraction replay of the method-of-small-P two-sided
tail, Fisher's own tea-tasting table (3,1;1,3 -> p = 34/70) as the
published anchor, a clearly-significant table, the degenerate-margin
p = 1 lane, and the out-of-regime NULL contract; conductance against
a dict replay, the isolated-community 0 lane, the complete-bipartite
10^6 anchor, the single-community NULL contract, and self-loop
dropping."""

from __future__ import annotations

from fractions import Fraction
from math import comb

from spanluke_spark.evaluation.fisher import fisher_exact
from spanluke_spark.graph.conductance import conductance

# -------------------------------------------------------------- fisher


def py_fisher(a, b, c, d):
    r1, r2, c1 = a + b, c + d, a + c
    ks = range(max(0, c1 - r2), min(r1, c1) + 1)
    w = {k: comb(r1, k) * comb(r2, c1 - k) for k in ks}
    wobs = w[a]
    p_num = sum(x for x in w.values() if x <= wobs)
    p_den = sum(w.values())
    assert p_den == comb(r1 + r2, c1)  # Vandermonde
    return {
        "w_obs": wobs,
        "p_num": p_num,
        "p_den": p_den,
        "p_ppm": p_num * 1_000_000 // p_den,
        "sig05": Fraction(p_num, p_den) <= Fraction(1, 20),
    }


def _run_fisher(spark, tables):
    df = spark.createDataFrame(
        tables, "grp long, a long, b long, c long, d long"
    )
    return {
        r["grp"]: r.asDict() for r in fisher_exact(df).collect()
    }


def test_fisher_tea_tasting_anchor(spark):
    """Fisher 1935 lady-tasting-tea table (3,1;1,3): weights
    1,16,36,16,1 over C(8,4)=70, two-sided p = 34/70."""
    got = _run_fisher(spark, [(0, 3, 1, 1, 3)])[0]
    assert (got["w_obs"], got["p_num"], got["p_den"]) == (16, 34, 70)
    assert got["p_ppm"] == 485_714 and got["sig05"] is False


def test_fisher_matches_comb_replay(spark):
    tables = [
        (i, (i * 3) % 12, (i * 5 + 2) % 9, (i * 7 + 1) % 11, (i * 2 + 3) % 10)
        for i in range(25)
    ]
    got = _run_fisher(spark, tables)
    for grp, a, b, c, d in tables:
        exp = py_fisher(a, b, c, d)
        g = got[grp]
        for k, v in exp.items():
            assert g[k] == v, (grp, k, g[k], v)


def test_fisher_strong_association_is_significant(spark):
    """(12,0;2,14): p well below 0.05."""
    got = _run_fisher(spark, [(0, 12, 0, 2, 14)])[0]
    exp = py_fisher(12, 0, 2, 14)
    assert got["p_num"] == exp["p_num"] and got["sig05"] is True
    assert got["p_ppm"] == exp["p_ppm"] < 50_000


def test_fisher_degenerate_margin_p_is_one(spark):
    """c1 = 0 -> single k, p = 1 exactly."""
    got = _run_fisher(spark, [(0, 0, 8, 0, 6)])[0]
    assert (got["p_num"], got["p_den"], got["p_ppm"]) == (1, 1, 1_000_000)
    assert got["sig05"] is False


def test_fisher_out_of_regime_is_null(spark):
    got = _run_fisher(spark, [(0, 15, 9, 3, 4), (1, 5, 5, 5, 5)])
    bad, good = got[0], got[1]
    assert bad["a"] == 15 and bad["p_num"] is None
    assert bad["p_den"] is None and bad["p_ppm"] is None
    assert bad["sig05"] is None
    assert good["p_den"] == comb(20, 10)


# --------------------------------------------------------- conductance


def py_conductance(edges, label):
    from collections import defaultdict

    vol, cut = defaultdict(int), defaultdict(int)
    for u, v in edges:
        if u == v:
            continue
        lu, lv = label(u), label(v)
        vol[lu] += 1
        vol[lv] += 1
        if lu != lv:
            cut[lu] += 1
            cut[lv] += 1
    m2 = sum(vol.values())
    return {
        c: (
            vol[c],
            cut[c],
            cut[c] * 1_000_000 // min(vol[c], m2 - vol[c])
            if min(vol[c], m2 - vol[c]) > 0
            else None,
        )
        for c in vol
    }


def _run_cond(spark, edges, label, n_nodes):
    e = spark.createDataFrame(edges, "u long, v long")
    nodes = spark.createDataFrame(
        [(i, label(i)) for i in range(n_nodes)], "id long, community long"
    )
    return {
        r["community"]: (r["vol"], r["cut"], r["phi_ppm"])
        for r in conductance(e, nodes).collect()
    }


def test_conductance_matches_dict_replay(spark):
    edges = [(i % 40, (i * 17 + 3) % 40) for i in range(120)]
    label = lambda x: x // 10  # noqa: E731
    got = _run_cond(spark, edges, label, 40)
    assert got == py_conductance(edges, label)


def test_conductance_isolated_blocks_are_zero_and_bipartite_is_one(spark):
    # two cliques, no boundary -> phi = 0 for both
    iso = [(u, v) for u in range(4) for v in range(4) if u < v] + [
        (u + 4, v + 4) for u in range(4) for v in range(4) if u < v
    ]
    got = _run_cond(spark, iso, lambda x: x // 4, 8)
    assert got[0] == (12, 0, 0) and got[1] == (12, 0, 0)
    # complete bipartite, labels = sides -> every edge is cut, phi = 1e6
    bip = [(u, v + 3) for u in range(3) for v in range(5)]
    got = _run_cond(spark, bip, lambda x: 0 if x < 3 else 1, 8)
    assert got[0] == (15, 15, 1_000_000)
    assert got[1] == (15, 15, 1_000_000)


def test_conductance_single_community_is_null(spark):
    edges = [(i, (i + 1) % 6) for i in range(6)]
    got = _run_cond(spark, edges, lambda x: 0, 6)
    assert got[0] == (12, 0, None)


def test_conductance_drops_self_loops(spark):
    edges = [(0, 1), (1, 2), (2, 3)]
    label = lambda x: x % 2  # noqa: E731
    base = _run_cond(spark, edges, label, 4)
    with_loops = _run_cond(spark, edges + [(1, 1), (3, 3)], label, 4)
    assert base == with_loops
