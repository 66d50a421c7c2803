"""Gates for WER operation counts (evaluation/wer.py) and Misra-Gries
mergeable heavy hitters (textops/heavyhitters.py): WER against a
Python DP replay with the identical lexicographic (d, s, dd, ii)
tie-break, the swap anchor that separates lex-min from naive backtrace
order, identity/deletion-only/empty-hypothesis anchors; MG against a
bit-exact two-level Python replay plus the three paper guarantees —
undercount-only, per-item error <= 2n/(k+1), and every true heavy
hitter above the bound survives into the summary."""

from __future__ import annotations

import hashlib
from collections import Counter

from spanluke_spark.evaluation.wer import wer
from spanluke_spark.textops.heavyhitters import misra_gries


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


# ----------------------------------------------------------------- WER


def py_wer(hyp, ref):
    """Exact DP carrying (d, s, dd, ii) with tuple (= lexicographic)
    min — the same order the packed integer keys impose."""
    m = len(ref)
    prev = [(j, 0, j, 0) for j in range(m + 1)]
    for c in hyp:
        cur = [(prev[0][0] + 1, prev[0][1], prev[0][2], prev[0][3] + 1)]
        for j in range(1, m + 1):
            d, s, dd, ii = prev[j]
            cands = [(d + 1, s, dd, ii + 1)]  # insertion
            d, s, dd, ii = prev[j - 1]
            cands.append(
                (d, s, dd, ii) if ref[j - 1] == c else (d + 1, s + 1, dd, ii)
            )
            d, s, dd, ii = cur[j - 1]
            cands.append((d + 1, s, dd + 1, ii))  # deletion
            cur.append(min(cands))
        prev = cur
    return prev[m]


def _run_wer(spark, pairs):
    df = spark.createDataFrame(
        pairs, "pair_id long, hyp array<string>, ref array<string>"
    )
    return {r["pair_id"]: r.asDict() for r in wer(df).collect()}


def test_wer_matches_python_dp_on_random_sequences(spark):
    vocab = ["a", "b", "c", "d"]
    pairs = []
    for i in range(40):
        hyp = [vocab[h("h", i, j) % 4] for j in range(h("lh", i) % 12)]
        ref = [vocab[h("r", i, j) % 4] for j in range(h("lr", i) % 12 + 1)]
        pairs.append((i, hyp, ref))
    got = _run_wer(spark, pairs)
    for i, hyp, ref in pairs:
        d, s, dd, ii = py_wer(hyp, ref)
        row = got[i]
        assert (
            row["dist"], row["subs"], row["dels"], row["ins"]
        ) == (d, s, dd, ii), (i, hyp, ref)
        assert row["wer_ppm"] == d * 1_000_000 // len(ref)
        assert d == s + dd + ii  # decomposition identity


def test_wer_anchors_and_lexmin_tiebreak(spark):
    got = _run_wer(
        spark,
        [
            (1, ["the", "cat", "sat"], ["the", "cat", "sat"]),
            (2, ["the", "cat", "sat", "mat"],
                ["the", "cat", "sat", "on", "the", "mat"]),
            (3, [], ["a", "b", "c"]),
            (4, ["x", "y"], ["y", "x"]),
            (5, ["a", "c"], ["a", "b"]),
        ],
    )
    r = got[1]
    assert (r["dist"], r["wer_ppm"]) == (0, 0)
    r = got[2]  # two reference words unmatched -> pure deletions
    assert (r["dist"], r["subs"], r["dels"], r["ins"]) == (2, 0, 2, 0)
    assert r["wer_ppm"] == 2 * 1_000_000 // 6
    r = got[3]  # empty hypothesis = R deletions, WER 100%
    assert (r["dist"], r["dels"], r["wer_ppm"]) == (3, 3, 1_000_000)
    # swap: (2,0,1,1) beats the 2-substitution alignment lexicographically
    r = got[4]
    assert (r["dist"], r["subs"], r["dels"], r["ins"]) == (2, 0, 1, 1)
    r = got[5]  # one substitution beats del+ins on distance alone
    assert (r["dist"], r["subs"], r["dels"], r["ins"]) == (1, 1, 0, 0)


def test_wer_drops_empty_reference_keeps_long_guard(spark):
    got = _run_wer(spark, [(1, ["a"], []), (2, ["a"], ["a"])])
    assert set(got) == {2}


# ---------------------------------------------------------- MisraGries


def py_misra_gries(rows, k):
    """Bit-exact two-level replay: exact shard counts -> prune to k by
    the (k+1)-st largest under (cnt DESC, token ASC) -> sum -> prune."""

    def prune(cnt: Counter) -> Counter:
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        thr = ranked[k][1] if len(ranked) > k else 0
        return Counter(
            {t: c - thr for t, c in ranked[:k] if c - thr > 0}
        )

    shards = {}
    for shard, token in rows:
        shards.setdefault(shard, Counter())[token] += 1
    merged = Counter()
    for c in shards.values():
        merged.update(prune(c))
    return prune(merged)


def _fixture(n_shards=4, n=400):
    # zipf-ish: token id = floor(sqrt(u)) over a quadratic ramp -> few
    # very hot tokens, a long tail
    rows = []
    for i in range(n):
        u = h("t", i) % 900
        tok = f"w{int(u ** 0.5)}"
        rows.append((i % n_shards, tok))
    return rows


def _run_mg(spark, rows, k):
    df = spark.createDataFrame(rows, "shard int, token string")
    return misra_gries(df, k=k).collect()


def test_mg_matches_python_two_level_replay(spark):
    rows = _fixture()
    for k in (4, 8, 16):
        got = {r["token"]: r["f_hat"] for r in _run_mg(spark, rows, k)}
        exp = dict(py_misra_gries(rows, k))
        assert got == exp, k


def test_mg_paper_guarantees(spark):
    rows = _fixture()
    k = 8
    n = len(rows)
    exact = Counter(t for _, t in rows)
    got = {r["token"]: r["f_hat"] for r in _run_mg(spark, rows, k)}
    assert len(got) <= k
    bound = 2 * n // (k + 1)
    for tok, est in got.items():
        under = exact[tok] - est
        assert 0 <= under <= bound, (tok, est, exact[tok])  # undercount only
    # every true heavy hitter above the bound survives
    for tok, f in exact.items():
        if f > bound:
            assert tok in got, (tok, f, bound)


def test_mg_exact_regime_and_rank_determinism(spark):
    # <= k distinct everywhere: estimates are the exact counts
    rows = [(i % 2, t) for i, t in enumerate(["x"] * 5 + ["y"] * 3 + ["z"] * 2)]
    out = _run_mg(spark, rows, 8)
    assert {r["token"]: r["f_hat"] for r in out} == {"x": 5, "y": 3, "z": 2}
    assert [r["token"] for r in sorted(out, key=lambda r: r["rnk"])] == [
        "x", "y", "z",
    ]
