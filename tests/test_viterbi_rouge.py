"""Gates for HMM Viterbi decoding (ner/viterbi.py) and ROUGE-L
(evaluation/rouge.py): the classic clinic HMM anchor (best path
Healthy,Healthy,Fever on normal,cold,dizzy), bit-exact parity vs a
pure-Python DP with the same lowest-index tie-break (including an
all-ties degenerate model), Lin-2004-style LCS anchors, and random
parity for the monotone-row prefix-max LCS fold."""

from __future__ import annotations

import hashlib
import math

from spanluke_spark.evaluation.rouge import rouge_l
from spanluke_spark.ner.viterbi import viterbi_decode


def q(p: float, k: int = 1000) -> int:
    return round(k * math.log(p))


# the classic two-state clinic HMM (public textbook example)
START = [q(0.6), q(0.4)]
TRANS = [[q(0.7), q(0.3)], [q(0.4), q(0.6)]]
EMIT = {
    "normal": [q(0.5), q(0.1)],
    "cold": [q(0.4), q(0.3)],
    "dizzy": [q(0.1), q(0.6)],
}


def py_viterbi(obs, start, trans, emit):
    """Exact integer Viterbi, ties to the lowest state index."""
    S = len(start)
    scores = [start[s] + emit[obs[0]][s] for s in range(S)]
    paths = [[s] for s in range(S)]
    for tok in obs[1:]:
        ns, np_ = [], []
        for s in range(S):
            cands = [scores[p] + trans[p][s] for p in range(S)]
            best = max(cands)
            prev = cands.index(best)  # first occurrence = lowest index
            ns.append(best + emit[tok][s])
            np_.append(paths[prev] + [s])
        scores, paths = ns, np_
    best = max(scores)
    s = scores.index(best)
    return ",".join(map(str, paths[s])), best


def test_viterbi_clinic_anchor(spark):
    df = spark.createDataFrame(
        [(1, ["normal", "cold", "dizzy"])], "seq_id int, obs array<string>"
    )
    row = viterbi_decode(df, START, TRANS, EMIT).collect()[0]
    assert row["path"] == "0,0,1"  # Healthy, Healthy, Fever
    assert row["n"] == 3
    exp_path, exp_score = py_viterbi(["normal", "cold", "dizzy"], START, TRANS, EMIT)
    assert (row["path"], row["best_score"]) == (exp_path, exp_score)


def test_viterbi_single_token_and_empty(spark):
    df = spark.createDataFrame(
        [(1, ["dizzy"]), (2, [])], "seq_id int, obs array<string>"
    )
    rows = {r["seq_id"]: r for r in viterbi_decode(df, START, TRANS, EMIT).collect()}
    assert set(rows) == {1}  # empty sequence dropped
    # start: H -511+(-2303) ; F -916+(-511) -> Fever wins
    assert rows[1]["path"] == "1"
    assert rows[1]["best_score"] == START[1] + EMIT["dizzy"][1]


def test_viterbi_all_ties_breaks_to_lowest_state(spark):
    start = [0, 0, 0]
    trans = [[0, 0, 0]] * 3
    emit = {"a": [0, 0, 0], "b": [0, 0, 0]}
    df = spark.createDataFrame(
        [(1, ["a", "b", "a", "a"])], "seq_id int, obs array<string>"
    )
    row = viterbi_decode(df, start, trans, emit).collect()[0]
    assert row["path"] == "0,0,0,0" and row["best_score"] == 0


def test_viterbi_random_parity(spark):
    def h(*xs):
        return int.from_bytes(
            hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
        )

    start = [-(h("s", s) % 900) for s in range(3)]
    trans = [[-(h("t", p, s) % 900) for s in range(3)] for p in range(3)]
    vocab = ["v0", "v1", "v2", "v3"]
    emit = {t: [-(h("e", t, s) % 900) for s in range(3)] for t in vocab}
    rows = [
        (i, [vocab[h("o", i, j) % 4] for j in range(1 + h("n", i) % 9)])
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "seq_id int, obs array<string>")
    got = {r["seq_id"]: r for r in viterbi_decode(df, start, trans, emit).collect()}
    assert len(got) == 25
    for i, obs in rows:
        exp_path, exp_score = py_viterbi(obs, start, trans, emit)
        assert (got[i]["path"], got[i]["best_score"]) == (exp_path, exp_score), i


def py_lcs(a, b):
    row = [0] * (len(b) + 1)
    for c in a:
        new = [0]
        for j in range(1, len(b) + 1):
            new.append(
                row[j - 1] + 1 if b[j - 1] == c else max(new[j - 1], row[j])
            )
        row = new
    return row[-1]


def test_rouge_l_anchors(spark):
    df = spark.createDataFrame(
        [
            (1, "police kill the gunman".split(), "police killed the gunman".split()),
            (2, "a b c d".split(), "a c b d".split()),
            (3, "x y".split(), "x y".split()),
            (4, "p q".split(), "r s".split()),
            (5, [], "a".split()),
        ],
        "pair_id int, cand array<string>, ref array<string>",
    )
    got = {r["pair_id"]: r for r in rouge_l(df).collect()}
    assert set(got) == {1, 2, 3, 4}  # empty candidate dropped
    # Lin 2004 §3.1: LCS("police kill the gunman", ref) = 3 of 4
    assert got[1]["lcs"] == 3
    assert got[1]["p_ppm"] == got[1]["r_ppm"] == 750_000
    assert (got[1]["f_num"], got[1]["f_den"]) == (6, 8)
    assert got[1]["f_ppm"] == 750_000
    assert got[2]["lcs"] == 3
    assert got[3]["lcs"] == 2 and got[3]["f_ppm"] == 1_000_000
    assert got[4]["lcs"] == 0 and got[4]["f_ppm"] == 0


def test_rouge_l_random_parity(spark):
    def h(*xs):
        return int.from_bytes(
            hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
        )

    vocab = [f"w{k}" for k in range(6)]
    rows = []
    for i in range(30):
        cl, rl = 1 + h("c", i) % 12, 1 + h("r", i) % 12
        rows.append(
            (
                i,
                [vocab[h("ct", i, j) % 6] for j in range(cl)],
                [vocab[h("rt", i, j) % 6] for j in range(rl)],
            )
        )
    df = spark.createDataFrame(rows, "pair_id int, cand array<string>, ref array<string>")
    got = {r["pair_id"]: r for r in rouge_l(df).collect()}
    for i, cand, ref in rows:
        lcs = py_lcs(cand, ref)
        r = got[i]
        assert r["lcs"] == lcs, i
        assert r["f_ppm"] == 2 * lcs * 1_000_000 // (len(cand) + len(ref))
        assert r["p_ppm"] == lcs * 1_000_000 // len(cand)
        assert r["r_ppm"] == lcs * 1_000_000 // len(ref)
