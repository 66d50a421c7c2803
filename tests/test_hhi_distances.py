"""Gates for the HHI panel (textops/concentration.py) and the
TVD/chi-square distribution distance (textops/distances.py): HHI
against a replay, equal-shares exact closed forms (hhi = 1e6 div n,
nhhi = 0, enp = 1000n), monopoly (1e6, 1e6, 1000), the merger S2
identity, single-unit NULL nhhi; distances against a replay AND float
cross-checks, identical-corpora zero, disjoint-vocab exact 1e6 TVD,
A<->B swap symmetry, and corpus-duplication invariance of TVD."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.textops.concentration import hhi_panel
from spanluke_spark.textops.distances import distribution_distance

# ---------------------------------------------------- python replays


def py_hhi(units):
    c = Counter(units)
    n = len(c)
    total = sum(c.values())
    s2 = sum(v * v for v in c.values())
    return {
        "n_units": n,
        "total": total,
        "s2": s2,
        "hhi_ppm": 10**6 * s2 // (total * total) if total else None,
        "nhhi_ppm": (
            10**6 * (n * s2 - total * total)
            // (total * total * (n - 1))
            if total and n > 1
            else None
        ),
        "enp_milli": 1000 * total * total // s2 if s2 else None,
    }


def py_dist(texts_a, texts_b):
    ca = Counter(t for s in texts_a for t in s.split() if t)
    cb = Counter(t for s in texts_b for t in s.split() if t)
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    l1 = sum(abs(ca[t] * nb - cb[t] * na) for t in vocab)
    chi2 = sum(
        1000 * (ca[t] * nb - cb[t] * na) ** 2
        // (na * nb * (ca[t] + cb[t]))
        for t in vocab
    )
    return {
        "n_a": na,
        "n_b": nb,
        "n_types": len(vocab),
        "n_shared": len(set(ca) & set(cb)),
        "n_only_a": len(set(ca) - set(cb)),
        "n_only_b": len(set(cb) - set(ca)),
        "tv_ppm": 10**6 * l1 // (2 * na * nb) if na and nb else None,
        "chi2_milli": chi2,
    }


def _run_hhi(spark, units):
    df = spark.createDataFrame([(u,) for u in units], "unit long")
    return hhi_panel(df).collect()[0].asDict()


def _run_dist(spark, texts_a, texts_b):
    da = spark.createDataFrame([(t,) for t in texts_a], "text string")
    db = spark.createDataFrame([(t,) for t in texts_b], "text string")
    return distribution_distance(da, db).collect()[0].asDict()


# ----------------------------------------------------------------- hhi


def test_hhi_matches_replay(spark):
    units = [0 if e % 3 == 0 else e % 25 for e in range(500)]
    assert _run_hhi(spark, units) == py_hhi(units)


def test_hhi_equal_shares_closed_forms(spark):
    n, c = 20, 7
    got = _run_hhi(spark, [u for u in range(n) for _ in range(c)])
    assert got["hhi_ppm"] == 10**6 // n
    assert got["nhhi_ppm"] == 0
    assert got["enp_milli"] == 1000 * n


def test_hhi_monopoly(spark):
    got = _run_hhi(spark, [3] * 50)
    assert got["hhi_ppm"] == 10**6 and got["enp_milli"] == 1000
    assert got["nhhi_ppm"] is None  # n = 1: normalization undefined


def test_hhi_merger_identity(spark):
    """Merging units a and b raises S2 by exactly 2*c_a*c_b."""
    units = [0] * 10 + [1] * 6 + [2] * 4
    merged = [0] * 10 + [1] * 10  # unit 2 folded into unit 1
    a, b = _run_hhi(spark, units), _run_hhi(spark, merged)
    assert b["s2"] - a["s2"] == 2 * 6 * 4
    assert b["hhi_ppm"] > a["hhi_ppm"]


# ------------------------------------------------------------ distance

A = ["the court held the appeal", "statute provision appeal denied"] * 3
B = ["the appeal was denied", "the court denied provision"] * 3


def test_dist_matches_replay_and_float(spark):
    got = _run_dist(spark, A, B)
    exp = py_dist(A, B)
    assert got == exp
    # float TVD cross-check
    ca = Counter(t for s in A for t in s.split())
    cb = Counter(t for s in B for t in s.split())
    na, nb = sum(ca.values()), sum(cb.values())
    tv = sum(
        abs(ca[t] / na - cb[t] / nb) for t in set(ca) | set(cb)
    ) / 2
    assert got["tv_ppm"] == int(tv * 10**6)


def test_dist_identical_zero(spark):
    got = _run_dist(spark, A, list(A))
    assert got["tv_ppm"] == 0 and got["chi2_milli"] == 0
    assert got["n_only_a"] == 0 and got["n_only_b"] == 0


def test_dist_disjoint_exact_one(spark):
    got = _run_dist(spark, ["aa bb cc aa"], ["dd ee ff"])
    assert got["tv_ppm"] == 10**6 and got["n_shared"] == 0


def test_dist_swap_symmetry(spark):
    a, b = _run_dist(spark, A, B), _run_dist(spark, B, A)
    assert a["tv_ppm"] == b["tv_ppm"]
    assert a["chi2_milli"] == b["chi2_milli"]
    assert a["n_only_a"] == b["n_only_b"]


def test_dist_duplication_invariance(spark):
    """b_i -> 2*b_i doubles both sides of the TVD division: exact."""
    a = _run_dist(spark, A, B)
    b = _run_dist(spark, A, B + B)
    assert a["tv_ppm"] == b["tv_ppm"]
