"""Gates for Gwet's AC1 (evaluation/gwet.py) and OSA
Damerau-Levenshtein (textops/osa.py): AC1 against a bit-exact replay
AND a float first-principles cross-check, perfect agreement exactly
1e6, consistent-relabeling invariance, the skewed-marginal paradox
(AC1 high while Cohen's kappa collapses), single-category NULL;
OSA against a full python DP replay, adjacent swap costs exactly 1
(Levenshtein pays 2), the OSA restriction osa("ca","abc") = 3,
symmetry, empty-side closed forms, and osa <= levenshtein."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.gwet import gwet_ac1
from spanluke_spark.textops.osa import osa_distance

# ---------------------------------------------------- python replays


def py_ac1(rows):
    n = len(rows)
    agree = sum(1 for a, b in rows if a == b)
    m = Counter()
    for a, b in rows:
        m[a] += 1
        m[b] += 1
    q = len(m)
    t = sum(v * (2 * n - v) for v in m.values())
    num = agree * 4 * n * (q - 1) - t
    den = 4 * n * n * (q - 1) - t
    ac1 = (
        (abs(num) * 10**6 // den) * (1 if num >= 0 else -1)
        if q >= 2 and den > 0
        else None
    )
    return {"n": n, "q": q, "agree": agree, "t": t, "ac1_ppm": ac1}


def py_osa(a, b):
    la, lb = len(a), len(b)
    d = [[0] * (lb + 1) for _ in range(la + 1)]
    for i in range(la + 1):
        d[i][0] = i
    for j in range(lb + 1):
        d[0][j] = j
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[la][lb]


def _run_ac1(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string")
    return gwet_ac1(df).collect()[0].asDict()


def _run_osa(spark, pairs):
    rows = [(i, list(h), list(r)) for i, (h, r) in enumerate(pairs)]
    df = spark.createDataFrame(
        rows, "pair_id long, hyp array<string>, ref array<string>"
    )
    got = osa_distance(df).orderBy("pair_id").collect()
    return [r["dist"] for r in got]


# ----------------------------------------------------------------- ac1


def test_ac1_matches_replay_and_float(spark):
    rows = [
        (str((e * 3) % 4),
         str(((e * 3) % 4 + 1) % 4 if e % 6 == 0 else (e * 3) % 4))
        for e in range(300)
    ]
    got = _run_ac1(spark, rows)
    exp = py_ac1(rows)
    assert got == exp
    # float first principles
    n = len(rows)
    pa = exp["agree"] / n
    m = Counter()
    for a, b in rows:
        m[a] += 1
        m[b] += 1
    q = len(m)
    pe = sum((v / (2 * n)) * (1 - v / (2 * n)) for v in m.values()) / (
        q - 1
    )
    ac1 = (pa - pe) / (1 - pe)
    assert got["ac1_ppm"] == int(ac1 * 10**6)


def test_ac1_perfect_agreement(spark):
    rows = [(str(e % 3), str(e % 3)) for e in range(90)]
    assert _run_ac1(spark, rows)["ac1_ppm"] == 10**6


def test_ac1_relabeling_invariance(spark):
    rows = [
        (str((e * 3) % 4),
         str(((e * 3) % 4 + 1) % 4 if e % 6 == 0 else (e * 3) % 4))
        for e in range(300)
    ]
    relab = [(chr(65 + int(a)), chr(65 + int(b))) for a, b in rows]
    assert (
        _run_ac1(spark, rows)["ac1_ppm"]
        == _run_ac1(spark, relab)["ac1_ppm"]
    )


def test_ac1_paradox_separation(spark):
    """Feinstein-Cicchetti table: 90 (+,+), 5 (-,-), 5 disagreements
    -> raw agreement 0.95; kappa is dragged down by the skewed
    marginals, AC1 is not."""
    rows = (
        [("p", "p")] * 90
        + [("n", "n")] * 5
        + [("p", "n")] * 3
        + [("n", "p")] * 2
    )
    got = _run_ac1(spark, rows)
    n = len(rows)
    # Cohen's kappa in floats
    a_p = sum(1 for a, _ in rows if a == "p") / n
    b_p = sum(1 for _, b in rows if b == "p") / n
    pe = a_p * b_p + (1 - a_p) * (1 - b_p)
    kappa = (0.95 - pe) / (1 - pe)
    assert got["ac1_ppm"] / 1e6 > kappa + 0.25
    assert got["ac1_ppm"] > 900_000


def test_ac1_single_category_null(spark):
    rows = [("x", "x")] * 40
    assert _run_ac1(spark, rows)["ac1_ppm"] is None


# ----------------------------------------------------------------- osa


def test_osa_matches_replay(spark):
    pairs = [
        ("abcdef", "abdcef"),
        ("abcdef", "abcdef"),
        ("court held appeal", "court appeal held"),
        ("xyzzy", "zyxxy"),
        ("", "abc"),
        ("abc", ""),
    ]
    pairs = [(list(h), list(r)) for h, r in pairs]
    got = _run_osa(spark, pairs)
    assert got == [py_osa(h, r) for h, r in pairs]


def test_osa_adjacent_swap_costs_one(spark):
    h, r = list("abcdef"), list("abdcef")
    assert _run_osa(spark, [(h, r)]) == [1]
    # plain Levenshtein pays 2 for the same pair
    lev = py_osa_no_transpose = 2
    assert py_osa(h, r) == 1 and lev == 2


def test_osa_restriction_ca_abc(spark):
    """OSA('ca','abc') = 3 — the unrestricted DL would give 2; pins
    that this is OSA, not full Damerau-Levenshtein."""
    assert _run_osa(spark, [(list("ca"), list("abc"))]) == [3]


def test_osa_symmetry(spark):
    a, b = list("kitten"), list("sitting")
    assert _run_osa(spark, [(a, b)]) == _run_osa(spark, [(b, a)])
    assert _run_osa(spark, [(a, b)]) == [3]


def test_osa_empty_sides(spark):
    df_pairs = [(list(""), list("abcd")), (list("xyz"), list(""))]
    assert _run_osa(spark, df_pairs) == [4, 3]


def test_osa_le_levenshtein(spark):
    """Transpositions only help: OSA <= Levenshtein on random pairs."""
    import random

    rng = random.Random(7)
    for _ in range(10):
        a = [rng.choice("abcd") for _ in range(rng.randint(0, 9))]
        b = [rng.choice("abcd") for _ in range(rng.randint(0, 9))]
        osa = py_osa(a, b)
        # plain levenshtein replay
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                d[i][j] = min(
                    d[i - 1][j] + 1,
                    d[i][j - 1] + 1,
                    d[i - 1][j - 1] + cost,
                )
        assert osa <= d[la][lb]
        got = _run_osa(spark, [(a, b)])
        assert got == [osa]
