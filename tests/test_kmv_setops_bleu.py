"""KMV set operations (textops/sketch.kmv_setops) and corpus BLEU
(evaluation/bleu.py) gates: exact-regime set algebra, estimator
accuracy on planted overlap, bit-exact Python replay of the sketch
chain; the Papineni clipping anchor, identity BLEU = 0 ln, brevity
penalty exactness, zero-match NULL semantics and a full Python replay
of the ppm chain."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from spanluke_spark.evaluation.bleu import bleu_corpus
from spanluke_spark.textops.sketch import kmv_setops


def h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_setops_exact_regime(spark):
    a = {f"w{i}" for i in range(10)}
    b = {f"w{i}" for i in range(5, 18)}
    rows = [("A", w) for w in a] + [("B", w) for w in b]
    df = spark.createDataFrame(rows, "g string, item string")
    from pyspark.sql import functions as F

    r = kmv_setops(df, "g", F.col("item"), k=64).collect()[0]
    assert (r["ga"], r["gb"]) == ("A", "B")
    assert r["n_kept"] == len(a | b)
    assert r["inter_kept"] == len(a & b)
    assert r["union_est"] == float(len(a | b))
    assert r["jacc_ppm"] == len(a & b) * 1_000_000 // len(a | b)
    assert abs(r["inter_est"] - len(a & b)) < 1e-9


def test_kmv_setops_matches_python_replay_and_accuracy(spark):
    # planted overlap: |A|=|B|=3000, |A∩B|=1000
    a = [f"x{i}" for i in range(3000)]
    b = [f"x{i}" for i in range(2000, 4000)] + [f"y{i}" for i in range(1000)]
    rows = [("A", w) for w in a] + [("B", w) for w in b]
    df = spark.createDataFrame(rows, "g string, item string")
    from pyspark.sql import functions as F

    k = 128
    r = kmv_setops(df, "g", F.col("item"), k=k).collect()[0]
    # python replay of the full chain
    ska = sorted(h64(w) for w in set(a))[:k]
    skb = sorted(h64(w) for w in set(b))[:k]
    union_rows = sorted(set(ska) | set(skb))[:k]
    inter = sum(1 for h in union_rows if h in set(ska) and h in set(skb))
    theta = union_rows[-1]
    assert (r["n_kept"], r["theta"], r["inter_kept"]) == (
        len(union_rows),
        theta,
        inter,
    )
    true_union = len(set(a) | set(b))
    true_inter = len(set(a) & set(b))
    assert abs(r["union_est"] - true_union) / true_union < 0.35
    assert abs(r["inter_est"] - true_inter) / true_inter < 0.6


def py_bleu(pairs, max_n=4):
    """pairs: list of (cand_tokens, ref_tokens) -> dict n -> (match,
    total, ln_ppm), plus (c, r, bp_ppm, ln_bleu_ppm, zero)."""
    per = {}
    for n in range(1, max_n + 1):
        m = t = 0
        for ca, ra in pairs:
            cg = Counter(
                tuple(ca[i : i + n]) for i in range(len(ca) - n + 1)
            )
            rg = Counter(
                tuple(ra[i : i + n]) for i in range(len(ra) - n + 1)
            )
            for g, c in cg.items():
                m += min(c, rg.get(g, 0))
                t += c
        ln = (
            int(round(math.log(m / t) * 1_000_000)) if m and t else None
        )
        per[n] = (m, t, ln)
    c = sum(len(ca) for ca, _ in pairs)
    r = sum(len(ra) for _, ra in pairs)
    bp = 0 if r <= c else -((r - c) * 1_000_000 // c)
    zero = any(per[n][0] == 0 for n in per)
    ln_bleu = None
    if not zero:
        s = sum(per[n][2] for n in per)
        ln_bleu = bp - ((-s) // max_n)
    return per, (c, r, bp, ln_bleu, zero)


def bleu_fixture():
    ref = "the quick brown fox jumps over the lazy dog today".split()
    cand1 = [w for i, w in enumerate(ref) if i % 7 != 3]
    ref2 = "a b c d e f g h i j k l".split()
    cand2 = "a b c d x f g h y j k".split()
    return [(1, cand1, ref), (2, cand2, ref2)]


def test_bleu_matches_python_replay(spark):
    fx = bleu_fixture()
    rows = [("g", i, " ".join(ca), " ".join(ra)) for i, ca, ra in fx]
    df = spark.createDataFrame(rows, "grp string, id long, cand string, ref string")
    got = {r["n"]: r for r in bleu_corpus(df).collect()}
    per, (c, r, bp, ln_bleu, zero) = py_bleu(
        [(ca, ra) for _, ca, ra in fx]
    )
    for n, (m, t, ln) in per.items():
        g = got[n]
        assert (g["match_cnt"], g["total_cnt"], g["ln_prec_ppm"]) == (
            m,
            t,
            ln,
        ), n
        assert (g["c_len"], g["r_len"], g["bp_ln_ppm"]) == (c, r, bp)
        assert g["ln_bleu_ppm"] == ln_bleu and g["zero_match"] == zero


def test_bleu_identity_is_zero_ln(spark):
    rows = [("g", 1, "a b c d e f", "a b c d e f")]
    df = spark.createDataFrame(rows, "grp string, id long, cand string, ref string")
    for r in bleu_corpus(df).collect():
        assert r["ln_prec_ppm"] == 0 and r["ln_bleu_ppm"] == 0
        assert r["bp_ln_ppm"] == 0 and not r["zero_match"]


def test_bleu_papineni_clipping_anchor(spark):
    # Papineni et al. 2002 §2.1: cand 'the'*7 vs ref -> p1 = 2/7
    rows = [
        ("g", 1, "the the the the the the the", "the cat is on the mat")
    ]
    df = spark.createDataFrame(rows, "grp string, id long, cand string, ref string")
    got = {r["n"]: r for r in bleu_corpus(df).collect()}
    assert (got[1]["match_cnt"], got[1]["total_cnt"]) == (2, 7)
    assert got[2]["match_cnt"] == 0  # no clipped bigram survives
    assert got[2]["zero_match"] and got[2]["ln_bleu_ppm"] is None


def test_bleu_brevity_penalty_exact(spark):
    # c=3, r=6 -> bp = -(3 * 1e6 // 3) = -1_000_000 (i.e. 1 - r/c = -1)
    rows = [("g", 1, "a b c", "a b c d e f")]
    df = spark.createDataFrame(rows, "grp string, id long, cand string, ref string")
    r1 = {r["n"]: r for r in bleu_corpus(df).collect()}[1]
    assert r1["bp_ln_ppm"] == -1_000_000
    assert r1["c_len"] == 3 and r1["r_len"] == 6
