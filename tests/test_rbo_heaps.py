"""Rank-biased overlap (evaluation/rbo.py) and Heaps' law fit
(textops/heaps.py) gates: brute Python RBO replay against the
published geometric-weight definition, identity/disjoint anchors,
depth bound; exact OLS replay of the Heaps chain on a synthetic
corpus with a planted power-law vocabulary and the beta in (0, 1)
sanity window."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.evaluation.rbo import MAX_DEPTH, rbo
from spanluke_spark.textops.heaps import heaps_fit


def py_rbo(ra, rb, depth):
    """ra/rb: item -> rank (1-based). Returns per-k (ov, term, rbo)
    with the exact integer ppm arithmetic."""
    out = {}
    run = 0
    for k in range(1, depth + 1):
        top_a = {i for i, r in ra.items() if r <= k}
        top_b = {i for i, r in rb.items() if r <= k}
        ov = len(top_a & top_b)
        term = ov * 9 ** (k - 1) * 1_000_000 // (k * 10**k)
        run += term
        out[k] = (ov, term, run)
    return out


def rankings(spark, ra, rb):
    a = spark.createDataFrame(list(ra.items()), "item string, rank int")
    b = spark.createDataFrame(list(rb.items()), "item string, rank int")
    return a, b


def test_rbo_matches_python_replay(spark):
    ra = {f"s{i}": i for i in range(1, 13)}
    # swap a few, displace others
    rb = {
        "s2": 1, "s1": 2, "s5": 3, "s4": 4, "s3": 5,
        "s9": 6, "s7": 7, "s8": 8, "s6": 9, "s12": 10,
        "s10": 11, "s11": 12,
    }
    a, b = rankings(spark, ra, rb)
    got = {r["k"]: r for r in rbo(a, b, depth=10).collect()}
    want = py_rbo(ra, rb, 10)
    for k, (ov, term, run) in want.items():
        r = got[k]
        assert (r["ov"], r["term_ppm"], r["rbo_ppm"]) == (ov, term, run), k


def test_rbo_identity_and_disjoint(spark):
    ra = {f"s{i}": i for i in range(1, 11)}
    a, b = rankings(spark, ra, ra)
    rows = {r["k"]: r for r in rbo(a, b, depth=10).collect()}
    # identical rankings: ov = k at every depth; rbo@k = sum of full weights
    for k, r in rows.items():
        assert r["ov"] == k
        assert r["term_ppm"] == 9 ** (k - 1) * 1_000_000 // 10**k
    # truncated RBO at depth 10 of identical lists = 1 - p^10 (ppm, trunc)
    assert abs(rows[10]["rbo_ppm"] - (1_000_000 - round(0.9**10 * 1e6))) <= 10
    rb = {f"t{i}": i for i in range(1, 11)}
    a, b = rankings(spark, ra, rb)
    for r in rbo(a, b, depth=10).collect():
        assert r["ov"] == 0 and r["rbo_ppm"] == 0


def test_rbo_depth_bound(spark):
    ra = {"x": 1}
    a, b = rankings(spark, ra, ra)
    with pytest.raises(ValueError):
        rbo(a, b, depth=MAX_DEPTH + 1)


def heaps_corpus():
    """Deterministic corpus with genuinely growing vocabulary: doc i
    contributes words from a Zipf-ish id stream."""
    docs = []
    for i in range(60):
        words = []
        for j in range(25):
            r = (i * 25 + j)
            # word id grows sublinearly -> Heaps-like growth
            wid = int((r + 1) ** 0.7) + (r % 7)
            words.append(f"w{wid}")
        docs.append(("g", i, " ".join(words)))
    return docs


def py_heaps(docs, n_points=20):
    seen = set()
    cum_n = 0
    pts = []
    n_docs = len(docs)
    step = (n_docs + n_points - 1) // n_points
    for rn, (_, _, text) in enumerate(sorted(docs, key=lambda t: t[1]), 1):
        ws = text.split()
        cum_n += len(ws)
        seen.update(ws)
        if rn % step == 0 and seen:
            pts.append(
                (
                    int(round(math.log(cum_n) * 1e4)),
                    int(round(math.log(len(seen)) * 1e4)),
                )
            )
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    mag = abs(num) * 1_000_000 // den
    beta = -mag if num < 0 else mag
    resid = sy * 100_000_000 - beta * sx * 100
    lnk = (
        -((-resid) // (n * 1_000_000))
        if resid < 0
        else resid // (n * 1_000_000)
    )
    return n, num, den, beta, lnk, cum_n, len(seen)


def test_heaps_matches_python_replay(spark):
    docs = heaps_corpus()
    df = spark.createDataFrame(docs, "grp string, id long, text string")
    r = heaps_fit(df).collect()[0]
    n, num, den, beta, lnk, n_tok, vocab = py_heaps(docs)
    assert (r["n_points"], r["beta_num"], r["beta_den"]) == (n, num, den)
    assert (r["beta_ppm"], r["lnk_ppm"]) == (beta, lnk)
    assert (r["n_tokens"], r["vocab"], r["n_docs"]) == (n_tok, vocab, 60)
    # Heaps exponent for a growing-vocab corpus sits strictly in (0, 1)
    assert 0 < r["beta_ppm"] < 1_000_000


def test_heaps_saturated_vocab_has_low_beta(spark):
    # tiny closed vocabulary: growth saturates, slope near 0 at the tail
    docs = [
        ("g", i, " ".join(f"v{(i * 25 + j) % 12}" for j in range(25)))
        for i in range(60)
    ]
    df = spark.createDataFrame(docs, "grp string, id long, text string")
    r = heaps_fit(df).collect()[0]
    assert r["vocab"] == 12
    assert r["beta_ppm"] < 100_000  # essentially flat
