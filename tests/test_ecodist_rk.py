"""Gates for the ecological distance panel (textops/ecodist.py) and
multiclass MCC (evaluation/concordance.py multiclass_mcc): distances
against a bit-exact replay AND float definitions, identity (bc = 0,
canberra = 0, mh = 1e6) and disjoint (bc = 1e6, canberra = 1000*n,
mh = 0) closed forms, A<->B symmetry for all three, and the property
split: Morisita-Horn exactly duplication-invariant, Bray-Curtis NOT;
R_K against replay AND float Gorodkin, the K=2 == binary-MCC exact
identity against the in-repo mcc_fm, perfect 1e6, relabeling
invariance, independence zero, constant-pred NULL."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.concordance import mcc_fm, multiclass_mcc
from spanluke_spark.textops.ecodist import ecological_distances

# ---------------------------------------------------- python replays


def py_eco(texts_a, texts_b):
    ca = Counter(t for s in texts_a for t in s.split() if t)
    cb = Counter(t for s in texts_b for t in s.split() if t)
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    l1 = sum(abs(ca[t] - cb[t]) for t in vocab)
    can = sum(
        1000 * abs(ca[t] - cb[t]) // (ca[t] + cb[t]) for t in vocab
    )
    sab = sum(ca[t] * cb[t] for t in vocab)
    saa = sum(v * v for v in ca.values())
    sbb = sum(v * v for v in cb.values())
    return {
        "n_a": na,
        "n_b": nb,
        "n_types": len(vocab),
        "bc_ppm": 10**6 * l1 // (na + nb) if na + nb else None,
        "canberra_milli": can,
        "mh_ppm": (
            10**6 * 2 * sab * na * nb
            // (saa * nb * nb + sbb * na * na)
            if na and nb
            else None
        ),
    }


def py_rk(rows):
    n = len(rows)
    agree = sum(1 for t, p in rows if t == p)
    tm = Counter(t for t, _ in rows)
    pm = Counter(p for _, p in rows)
    labs = set(tm) | set(pm)
    tp_cross = sum(tm.get(k, 0) * pm.get(k, 0) for k in labs)
    t2 = sum(v * v for v in tm.values())
    p2 = sum(v * v for v in pm.values())
    num = n * agree - tp_cross
    den = (n * n - p2) * (n * n - t2)
    rk2 = (
        (num * num * 10**6 // den) * (1 if num >= 0 else -1)
        if den > 0
        else None
    )
    return {
        "n": n, "k_classes": len(labs), "agree": agree,
        "num": num, "rk2_ppm": rk2,
    }


def _run_eco(spark, a, b):
    da = spark.createDataFrame([(t,) for t in a], "text string")
    db = spark.createDataFrame([(t,) for t in b], "text string")
    return ecological_distances(da, db).collect()[0].asDict()


def _run_rk(spark, rows):
    df = spark.createDataFrame(
        [(str(t), str(p)) for t, p in rows], "truth string, pred string"
    )
    return multiclass_mcc(df).collect()[0].asDict()


A = ["the court held the appeal", "statute provision appeal denied"] * 3
B = ["the appeal was denied", "the court denied provision twice"] * 3


# ----------------------------------------------------------- distances


def test_eco_matches_replay_and_float(spark):
    got = _run_eco(spark, A, B)
    exp = py_eco(A, B)
    assert got == exp
    ca = Counter(t for s in A for t in s.split())
    cb = Counter(t for s in B for t in s.split())
    na, nb = sum(ca.values()), sum(cb.values())
    bc = sum(abs(ca[t] - cb[t]) for t in set(ca) | set(cb)) / (na + nb)
    assert got["bc_ppm"] == int(bc * 10**6)
    mh = (
        2 * sum(ca[t] * cb[t] for t in set(ca) & set(cb))
        / (
            (
                sum(v * v for v in ca.values()) / na**2
                + sum(v * v for v in cb.values()) / nb**2
            )
            * na
            * nb
        )
    )
    assert abs(got["mh_ppm"] - mh * 10**6) <= 2


def test_eco_identity(spark):
    got = _run_eco(spark, A, list(A))
    assert got["bc_ppm"] == 0 and got["canberra_milli"] == 0
    assert got["mh_ppm"] == 10**6


def test_eco_disjoint(spark):
    got = _run_eco(spark, ["aa bb cc aa"], ["dd ee ff"])
    assert got["bc_ppm"] == 10**6
    assert got["canberra_milli"] == 1000 * got["n_types"]
    assert got["mh_ppm"] == 0


def test_eco_symmetry(spark):
    a, b = _run_eco(spark, A, B), _run_eco(spark, B, A)
    for k in ("bc_ppm", "canberra_milli", "mh_ppm"):
        assert a[k] == b[k]


def test_eco_duplication_property_split(spark):
    """MH is exactly invariant under B -> B+B; BC moves (corpus size
    becomes part of the dissimilarity)."""
    base = _run_eco(spark, A, B)
    dup = _run_eco(spark, A, B + B)
    assert base["mh_ppm"] == dup["mh_ppm"]
    assert base["bc_ppm"] != dup["bc_ppm"]


# ------------------------------------------------------------------ rk

ROWS = [
    ((e * 3) % 4,
     ((e * 3) % 4 + 1 + e % 3) % 4 if e % 6 == 0 else (e * 3) % 4)
    for e in range(400)
]


def test_rk_matches_replay_and_float(spark):
    got = _run_rk(spark, ROWS)
    exp = py_rk([(str(t), str(p)) for t, p in ROWS])
    assert got == exp
    n, agree = exp["n"], exp["agree"]
    tm = Counter(str(t) for t, _ in ROWS)
    pm = Counter(str(p) for _, p in ROWS)
    num = n * agree - sum(tm[k] * pm.get(k, 0) for k in tm)
    den = (
        (n * n - sum(v * v for v in pm.values()))
        * (n * n - sum(v * v for v in tm.values()))
    ) ** 0.5
    rk = num / den
    assert got["rk2_ppm"] == int(rk * rk * 10**6) * (1 if rk >= 0 else -1)


def test_rk_k2_is_binary_mcc(spark):
    rows = [
        ((e * 13) % 100 < 40,
         (e * 13) % 100 + 7 * (e % 5) - 3 * (e % 3) < 45)
        for e in range(400)
    ]
    df = spark.createDataFrame(rows, "truth boolean, pred boolean")
    binary = mcc_fm(df).collect()[0]["mcc2_ppm"]
    rk = _run_rk(spark, [(int(t), int(p)) for t, p in rows])
    assert rk["rk2_ppm"] == binary


def test_rk_perfect_and_relabel(spark):
    rows = [(e % 4, e % 4) for e in range(160)]
    assert _run_rk(spark, rows)["rk2_ppm"] == 10**6
    relab = [((t + 2) % 4, (p + 2) % 4) for t, p in ROWS]
    assert _run_rk(spark, relab)["rk2_ppm"] == _run_rk(spark, ROWS)["rk2_ppm"]


def test_rk_independent_zero_and_constant_null(spark):
    rows = [(e % 2, (e // 2) % 2) for e in range(80)]
    assert _run_rk(spark, rows)["rk2_ppm"] == 0
    const = [(e % 4, 1) for e in range(40)]
    assert _run_rk(spark, const)["rk2_ppm"] is None
