"""Winnowing (MOSS) fingerprints — Python brute-force parity, the
paper's shared-substring detection guarantee, the per-window coverage
invariant, and determinism across partitionings."""

from __future__ import annotations

import hashlib
import random

import pytest

from spanluke_spark.dedup.winnow import winnow_fingerprints, winnow_pairs


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    m = len(text) - k + 1
    if m <= 0:
        return set()
    g = [_h(text[i : i + k]) for i in range(m)]
    sel = set()
    for p in range(min(w, m) - 1, m):
        lo = max(0, p - w + 1)
        best = lo
        for j in range(lo, p + 1):
            if g[j] <= g[best]:
                best = j  # <= keeps the RIGHTMOST minimum
        sel.add((best, g[best]))
    return sel


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefgh ") for _ in range(n))


@pytest.mark.parametrize("k,w,seed", [(5, 4, 1), (3, 6, 2), (4, 2, 3)])
def test_matches_python_bruteforce(spark, k, w, seed):
    rng = random.Random(seed)
    docs = [(i, _rand_text(rng, rng.randrange(2, 60))) for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    want = {
        (i, pos, fp) for i, t in docs for (pos, fp) in _py_winnow(t, k, w)
    }
    assert got == want and len(got) > 0


def test_shared_substring_guarantee(spark):
    """Any shared substring of length >= w + k - 1 yields >= 1 shared
    fingerprint (theorem 1 of the paper) — the chunk is planted at a
    DIFFERENT offset in each document."""
    k, w = 5, 4
    rng = random.Random(9)
    chunk = _rand_text(rng, k + w - 1)
    docs = [
        (0, _rand_text(rng, 20) + chunk + _rand_text(rng, 15)),
        (1, _rand_text(rng, 7) + chunk + _rand_text(rng, 30)),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    fps = winnow_fingerprints(df, k=k, w=w)
    pairs = winnow_pairs(fps, min_shared=1).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 1 for r in pairs)


def test_every_window_is_covered(spark):
    """Density invariant: every window of w consecutive gram positions
    contains at least one selected position."""
    k, w = 5, 4
    rng = random.Random(21)
    text = _rand_text(rng, 100)
    df = spark.createDataFrame([(0, text)], "doc_id: long, text: string")
    sel = sorted(
        r["pos"] for r in winnow_fingerprints(df, k=k, w=w).collect()
    )
    m = len(text) - k + 1
    for p in range(w - 1, m):
        assert any(p - w + 1 <= s <= p for s in sel)


def test_determinism_across_partitionings(spark):
    rng = random.Random(33)
    docs = [(i, _rand_text(rng, 50)) for i in range(20)]
    df1 = spark.createDataFrame(docs, "doc_id: long, text: string")
    df8 = df1.repartition(8)
    a = sorted(map(tuple, winnow_fingerprints(df1).collect()))
    b = sorted(map(tuple, winnow_fingerprints(df8).collect()))
    assert a == b


def test_containment_vs_bruteforce(spark):
    """Exact containment on candidate pairs matches set arithmetic,
    including the asymmetric quote-inclusion direction."""
    from spanluke_spark.dedup.winnow import containment_pairs

    k = 5
    rng = random.Random(41)
    base = _rand_text(rng, 40)
    docs = [
        (0, base),
        (1, "zz" + base[5:25] + "qq"),   # quotes a chunk of 0
        (2, _rand_text(rng, 30)),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "id_a: long, id_b: long"
    )
    got = {
        (r["id_a"], r["id_b"]): (
            r["inter"],
            r["size_a"],
            r["size_b"],
            r["containment_a_in_b"],
            r["containment_b_in_a"],
        )
        for r in containment_pairs(df, pairs, k=k).collect()
    }

    def grams(t):
        return {t[i : i + k] for i in range(len(t) - k + 1)}

    g = {d: grams(t) for d, t in docs}
    for a, b in [(0, 1), (0, 2), (1, 2)]:
        inter = len(g[a] & g[b])
        assert got[(a, b)][0] == inter
        assert got[(a, b)][3] == pytest.approx(inter / len(g[a]), abs=2e-6)
        assert got[(a, b)][4] == pytest.approx(inter / len(g[b]), abs=2e-6)
    # the quoting doc is largely contained in the source, not vice versa
    assert got[(0, 1)][4] > got[(0, 1)][3]
