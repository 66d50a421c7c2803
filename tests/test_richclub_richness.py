"""Gates for the rich-club sweep (graph/richclub.py) and lexical
richness (textops/richness.py): rich-club against a definitional
python replay, the complete-graph exact-1e6 lane, the ring closed
form 2e6/(N-1) with NULL at k>=2, a planted hub clique sweeping to
exactly 1e6, duplicate/self-loop/direction invariance; richness
against a replay, all-distinct zero, single-type exact closed forms,
and the K ~ 10^4 * D near-identity in floats."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.graph.richclub import rich_club
from spanluke_spark.textops.richness import lexical_richness

# ---------------------------------------------------- python replays


def py_rich_club(edges, k_max):
    e = {
        (min(a, b), max(a, b))
        for a, b in edges
        if a != b
    }
    deg = Counter()
    for lo, hi in e:
        deg[lo] += 1
        deg[hi] += 1
    out = []
    for k in range(1, k_max + 1):
        nodes = [v for v, d in deg.items() if d > k]
        n_k = len(nodes)
        if n_k == 0:
            continue
        sk = set(nodes)
        e_k = sum(1 for lo, hi in e if lo in sk and hi in sk)
        phi = (
            2 * e_k * 10**6 // (n_k * (n_k - 1)) if n_k >= 2 else None
        )
        out.append(
            {"k": k, "n_k": n_k, "e_k": e_k, "phi_ppm": phi}
        )
    return out


def py_richness(texts):
    toks = [t for s in texts for t in s.split(" ") if t != ""]
    f = Counter(toks)
    n = len(toks)
    s2 = sum(v * v for v in f.values())
    rep = sum(v * (v - 1) for v in f.values())
    return {
        "n_tokens": n,
        "v_types": len(f),
        "v1_hapax": sum(1 for v in f.values() if v == 1),
        "v2_dis": sum(1 for v in f.values() if v == 2),
        "s2": s2,
        "k_milli": 10**7 * (s2 - n) // (n * n) if n >= 2 else None,
        "d_ppm": 10**6 * rep // (n * (n - 1)) if n >= 2 else None,
    }


def _run_rc(spark, edges, k_max):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = rich_club(df, k_max=k_max).orderBy("k").collect()
    return [r.asDict() for r in rows]


def _run_rich(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return lexical_richness(df).collect()[0].asDict()


# ----------------------------------------------------------- richclub


def test_rc_matches_replay(spark):
    edges = [((e * 3) % 20, (e * 7 + 1) % 20) for e in range(60)] + [
        (e % 20, e % 4) for e in range(40)
    ]
    assert _run_rc(spark, edges, 8) == py_rich_club(edges, 8)


def test_rc_complete_graph_exact_one(spark):
    n = 7
    edges = [(i, j) for i in range(n) for j in range(i + 1, n)]
    rows = _run_rc(spark, edges, n - 2)
    assert rows, "complete graph must keep every k < n-1 populated"
    for r in rows:
        assert r["n_k"] == n and r["phi_ppm"] == 10**6


def test_rc_ring_closed_form(spark):
    n = 24
    edges = [(i, (i + 1) % n) for i in range(n)]
    rows = _run_rc(spark, edges, 4)
    assert rows == [
        {"k": 1, "n_k": n, "e_k": n,
         "phi_ppm": 2 * 10**6 // (n - 1)}
    ]  # all degrees are 2: k >= 2 leaves no nodes at all


def test_rc_planted_hub_clique_sweeps_to_one(spark):
    """5-clique hubs + 20 degree-2 leaves each hanging off two hubs:
    once k exceeds the leaf degree, only the clique survives and phi
    hits exactly 1e6."""
    hubs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    leaves = [(i % 5, 10 + i) for i in range(20)] + [
        ((i + 1) % 5, 10 + i) for i in range(20)
    ]
    rows = _run_rc(spark, hubs + leaves, 7)
    by_k = {r["k"]: r for r in rows}
    assert by_k[7]["n_k"] == 5 and by_k[7]["phi_ppm"] == 10**6
    assert by_k[1]["phi_ppm"] < 10**6


def test_rc_canonicalization_invariance(spark):
    """Duplicates, reversed directions and self-loops change nothing."""
    base = [(0, 1), (1, 2), (2, 3), (0, 2), (1, 3)]
    noisy = base + [(b, a) for a, b in base] + [(2, 2), (0, 1), (3, 3)]
    assert _run_rc(spark, base, 3) == _run_rc(spark, noisy, 3)


# ----------------------------------------------------------- richness


def test_richness_matches_replay(spark):
    texts = [
        "the court held the appeal",
        "the appeal was denied by the court",
        "statute provision statute provision provision",
    ] * 5
    assert _run_rich(spark, texts) == py_richness(texts)


def test_richness_all_distinct_zero(spark):
    got = _run_rich(spark, ["a b c d", "e f g"])
    assert got["k_milli"] == 0 and got["d_ppm"] == 0
    assert got["v1_hapax"] == 7 and got["s2"] == 7


def test_richness_single_type_closed_form(spark):
    n = 30
    got = _run_rich(spark, ["x " * n])
    assert got["n_tokens"] == n and got["v_types"] == 1
    assert got["d_ppm"] == 10**6
    assert got["k_milli"] == 10**7 * (n * n - n) // (n * n)


def test_richness_k_is_scaled_simpson(spark):
    """K == 10^4 * D * (N-1)/N exactly in rationals; float-gated."""
    texts = ["the quick brown fox the lazy dog the end"] * 4
    got = _run_rich(spark, texts)
    n = got["n_tokens"]
    k_from_d = 10 * got["d_ppm"] * (n - 1) / n
    assert abs(got["k_milli"] - k_from_d) <= 15  # two truncs apart
