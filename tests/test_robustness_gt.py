"""Robustness curve (graph/robustness.py) and Good-Turing table
(textops/goodturing.py) gates: a hand-built hub-and-spokes graph that
shatters exactly when its hub is removed, Python union-find replay
per k, isolated-survivor singleton semantics; the Gale-Sampson prose
example shape, mass conservation sum(mass_ppm) ~ 10^6, r* rational
exactness and the N_{r+1} = 0 gap NULL."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.graph.robustness import robustness_curve
from spanluke_spark.textops.goodturing import good_turing


def py_components(edges, removed):
    e = {
        (s, d)
        for s, d in edges
        if s != d and s not in removed and d not in removed
    }
    nodes = {x for p in edges if p[0] != p[1] for x in p} - removed
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in e:
        parent[find(s)] = find(d)
    sizes = Counter(find(n) for n in nodes)
    return len(sizes), max(sizes.values()) if sizes else 0, len(nodes), len(e)


def rb_fixture():
    # hub 0 connects 5 otherwise-disjoint chains
    edges = []
    for c in range(5):
        base = 10 * (c + 1)
        edges += [(base + i, base + i + 1) for i in range(3)]
        edges.append((0, base))
    # second hub 1 connects chains 0 and 1 only
    edges += [(1, 10), (1, 20)]
    return edges


def test_robustness_matches_python_union_find(spark):
    edges = rb_fixture()
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["k_removed"]: r
        for r in robustness_curve(df, ks=[0, 1, 2]).collect()
    }
    # replicate deterministic hub selection: degree desc, node asc
    deg = Counter()
    for s, d in {(s, d) for s, d in edges if s != d}:
        deg[s] += 1
        deg[d] += 1
    order = sorted(deg, key=lambda n: (-deg[n], n))
    n_total = len(deg)
    for k in (0, 1, 2):
        removed = set(order[:k])
        ncomp, giant, nn, ne = py_components(edges, removed)
        r = got[k]
        assert (
            r["n_components"],
            r["giant_size"],
            r["n_nodes"],
            r["n_edges"],
        ) == (ncomp, giant, nn, ne), k
        assert r["giant_share_ppm"] == giant * 1_000_000 // n_total
    # structural story: connected -> hub removal shatters
    assert got[0]["n_components"] == 1
    assert got[1]["n_components"] > 1
    assert got[1]["giant_share_ppm"] < got[0]["giant_share_ppm"]


def test_robustness_isolated_survivors_are_singletons(spark):
    # star: removing the center isolates every leaf
    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["k_removed"]: r for r in robustness_curve(df, ks=[0, 1]).collect()
    }
    assert got[0]["n_components"] == 1 and got[0]["giant_size"] == 6
    assert got[1]["n_components"] == 5 and got[1]["giant_size"] == 1
    assert got[1]["n_edges"] == 0


def gt_fixture():
    words = []
    for i in range(30):
        words.append(f"once{i}")  # 30 hapaxes
    for i in range(10):
        words += [f"twice{i}"] * 2  # 10 doubletons
    for i in range(2):
        words += [f"five{i}"] * 5  # 2 five-counts
    return " ".join(words)


def test_good_turing_matches_hand_computation(spark):
    df = spark.createDataFrame([("g", gt_fixture())], "grp string, text string")
    got = {r["r"]: r for r in good_turing(df).collect()}
    n = 30 + 20 + 10
    assert set(got) == {1, 2, 5}
    assert (got[1]["n_r"], got[1]["n_r_next"]) == (30, 10)
    # r* for hapaxes: (1+1)*10/30 = 2/3
    assert (got[1]["rstar_num"], got[1]["rstar_den"]) == (20, 30)
    assert got[1]["rstar_ppm"] == 666_666
    # gap: no r=3 class -> doubletons' r* is NULL
    assert got[2]["n_r_next"] == 0 and got[2]["rstar_ppm"] is None
    assert got[5]["mass_ppm"] == 10 * 1_000_000 // n
    # token mass conserves up to trunc
    assert sum(r["mass_ppm"] for r in got.values()) >= 999_997
    assert sum(r["mass_ppm"] for r in got.values()) <= 1_000_000
