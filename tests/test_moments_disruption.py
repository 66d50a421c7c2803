"""AMS tug-of-war F2 sketch (textops/moments.py) and CD/disruption
index (graph/disruption.py) gates: bit-exact Python replay of the
md5-salted sign counters, median-vs-exact accuracy, hand-built
disruptive/consolidating/bridging citation motifs, sign-sensitive
trunc rounding, and a 60-node brute-force replay."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from pyspark.sql import functions as F
import pytest

from spanluke_spark.graph.disruption import disruption_index
from spanluke_spark.textops.moments import ams_f2, exact_f2


def py_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_sign(key: str, r: int) -> int:
    return (py_hash(f"{key}|ams{r}") % 2) * 2 - 1


def fixture_tokens():
    # zipf-ish repeats: token t_j appears ~60//(j+1) times
    toks = []
    for j in range(60):
        toks.extend([f"t{j}"] * (60 // (j + 1)))
    return toks


def test_exact_f2_hand(spark):
    df = spark.createDataFrame([("a",), ("a",), ("a",), ("b",)], "item string")
    r = exact_f2(df).collect()[0]
    assert (r["n_occurrences"], r["n_distinct"], r["f2_exact"]) == (4, 2, 10)


def test_ams_matches_python_replay_and_is_accurate(spark):
    toks = fixture_tokens()
    df = spark.createDataFrame([(t,) for t in toks], "item string")
    got = ams_f2(df, d=9).collect()
    assert len(got) == 9
    counts = Counter(toks)
    f2 = sum(c * c for c in counts.values())
    z = {r: sum(py_sign(t, r) * c for t, c in counts.items()) for r in range(9)}
    ests = sorted(zr * zr for zr in z.values())
    med = ests[4]
    for row in got:
        assert row["z"] == z[row["r"]]
        assert row["est"] == z[row["r"]] ** 2
        assert row["est_median"] == med
        assert row["f2_exact"] == f2
        assert row["n_occurrences"] == len(toks)
    # tug-of-war accuracy on this fixture: median within 3x of truth
    assert f2 / 3 <= med <= 3 * f2


def test_ams_even_d_rejected(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        ams_f2(df, d=8)


def test_disruption_motifs(spark):
    # F cites R1, R2. A cites F alone (disrupting); B cites F and R1
    # (consolidating); C cites R2 alone (bypassing).
    edges = [
        ("F", "R1"), ("F", "R2"),
        ("A", "F"), ("B", "F"), ("B", "R1"), ("C", "R2"),
    ]
    df = spark.createDataFrame(edges, "citer string, cited string")
    rows = {r["f"]: r for r in disruption_index(df).collect()}
    rf = rows["F"]
    assert (rf["n_i"], rf["n_j"], rf["n_k"]) == (1, 1, 1)
    assert rf["cd_num"] == 0 and rf["cd_den"] == 3 and rf["cd_ppm"] == 0
    # R1: citers {F, B}; R1 has no refs -> both disrupting, CD = 1
    r1 = rows["R1"]
    assert (r1["n_i"], r1["n_j"], r1["n_k"]) == (2, 0, 0)
    assert r1["cd_ppm"] == 1000000


def test_disruption_negative_trunc_toward_zero(spark):
    # F cites R. B cites both (n_j=1), C cites R only (n_k=1):
    # CD(F) = (0-1)/2 = -0.5 -> ppm -500000; and a -1/3 case checks
    # trunc-toward-zero (-333333, not floor's -333334)
    edges = [("F", "R"), ("B", "F"), ("B", "R"), ("C", "R")]
    df = spark.createDataFrame(edges, "citer string, cited string")
    rf = {r["f"]: r for r in disruption_index(df).collect()}["F"]
    assert (rf["n_i"], rf["n_j"], rf["n_k"]) == (0, 1, 1)
    assert rf["cd_ppm"] == -500000
    edges2 = [("F", "R"), ("B", "F"), ("B", "R"), ("C", "R"), ("D", "R")]
    df2 = spark.createDataFrame(edges2, "citer string, cited string")
    rf2 = {r["f"]: r for r in disruption_index(df2).collect()}["F"]
    assert (rf2["cd_num"], rf2["cd_den"]) == (-1, 3)
    assert rf2["cd_ppm"] == -333333


def test_disruption_brute_force_replay(spark):
    edges = set()
    for i in range(400):
        citer = (i % 50) + 10
        cited = (i * 7919) % citer
        edges.add((citer, cited))
    df = spark.createDataFrame(sorted(edges), "citer long, cited long")
    got = {r["f"]: (r["n_i"], r["n_j"], r["n_k"]) for r in disruption_index(df).collect()}
    citers = defaultdict(set)
    refs = defaultdict(set)
    for u, v in edges:
        citers[v].add(u)
        refs[u].add(v)
    all_nodes = set(citers) | set(refs)
    want = {}
    for f in all_nodes:
        rc = {p for r in refs[f] for p in citers[r] if p != f}
        ni = len(citers[f] - rc)
        nj = len(citers[f] & rc)
        nk = len(rc - citers[f])
        if ni + nj + nk > 0 or f in citers or f in refs:
            want[f] = (ni, nj, nk)
    # module emits a row for every focal with citers or ref-citers
    for f, t in got.items():
        assert want[f] == t, f
    missing = {f for f, (a, b, c) in want.items() if (a or b or c)} - set(got)
    assert not missing
