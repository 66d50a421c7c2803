"""ROC-AUC (evaluation/roc.py) and multinomial Naive Bayes
(textops/nbayes.py) gates: brute-force pair-count AUC parity incl. the
tie half-credit term, perfect/inverted/degenerate groups, and a
bit-exact Python replay of the NB train+score chain plus a
planted-vocabulary separation test and the unseen-token floor."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.evaluation.roc import roc_auc
from spanluke_spark.textops.nbayes import PPM, nb_classify, nb_train


def brute_auc(pairs):
    """pairs: list of (label, score) -> (num2, den2) by definition."""
    pos = [s for y, s in pairs if y == 1]
    neg = [s for y, s in pairs if y == 0]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    return 2 * wins + ties, 2 * len(pos) * len(neg)


def roc_fixture():
    return {
        # heavy ties: scores quantized to 0..9
        "tied": [((i * 7) % 3 == 0, (i * i) % 10) for i in range(80)],
        "perfect": [(i >= 50, i) for i in range(100)],
        "inverted": [(i >= 50, -i) for i in range(100)],
        "all_pos": [(1, i % 5) for i in range(20)],
        "coin": [((i * 13) % 2, (i * 31) % 17) for i in range(60)],
    }


def test_roc_auc_matches_brute_force(spark):
    fx = roc_fixture()
    rows = [
        (g, int(y), int(s)) for g, pairs in fx.items() for y, s in pairs
    ]
    df = spark.createDataFrame(rows, "grp string, label long, score long")
    got = {r["grp"]: r for r in roc_auc(df).collect()}
    for g, pairs in fx.items():
        num2, den2 = brute_auc([(int(y), s) for y, s in pairs])
        r = got[g]
        assert (r["auc_num2"], r["auc_den2"]) == (num2, den2), g
        if den2:
            assert r["auc_ppm"] == num2 * 1_000_000 // den2
        else:
            assert r["auc_ppm"] is None
    assert got["perfect"]["auc_ppm"] == 1_000_000
    assert got["inverted"]["auc_ppm"] == 0
    assert got["all_pos"]["n_neg"] == 0 and got["all_pos"]["auc_ppm"] is None
    # coin flip should sit near 0.5
    assert 300_000 < got["coin"]["auc_ppm"] < 700_000


def test_roc_auc_constant_score_is_half(spark):
    rows = [("g", i % 2, 7) for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, label long, score long")
    r = roc_auc(df).collect()[0]
    assert r["auc_num2"] == r["auc_den2"] // 2  # all pairs tie -> 0.5
    assert r["auc_ppm"] == 500_000


# ---------------------------------------------------------------- NB


def nb_fixture():
    # planted class vocabularies with shared filler words
    train = [
        (0, "sport", "goal match team goal win"),
        (1, "sport", "team match score goal the"),
        (2, "sport", "win match the team score"),
        (3, "law", "court judge statute the ruling"),
        (4, "law", "judge appeal court statute the"),
        (5, "law", "ruling court the judge appeal"),
        (6, "law", "statute appeal ruling court the"),
    ]
    test = [
        (10, "goal team match win"),
        (11, "judge court statute appeal"),
        (12, "the the the"),          # filler only -> prior + shared
        (13, "quantum flux"),          # fully unseen -> floors + prior
    ]
    return train, test


def py_nb(train, test):
    ckw: Counter = Counter()
    totals: Counter = Counter()
    dk: Counter = Counter()
    vocab = set()
    for _, k, text in train:
        dk[k] += 1
        for w in text.split():
            if w:
                ckw[(k, w)] += 1
                totals[k] += 1
                vocab.add(w)
    v = len(vocab)
    n_docs = len(train)
    classes = sorted(dk)

    def q(x):
        return int(round(math.log(x) * PPM))

    tok = {
        (k, w): q((ckw[(k, w)] + 1) / (totals[k] + v))
        for k in classes
        for w in vocab
    }
    zero = {k: q(1 / (totals[k] + v)) for k in classes}
    prior = {k: q(dk[k] / n_docs) for k in classes}
    out = {}
    for i, text in test:
        words = [w for w in text.split() if w]
        if not words:
            continue
        scores = {}
        for k in classes:
            scores[k] = prior[k] + sum(
                tok.get((k, w), zero[k]) for w in words
            )
        best = min(classes, key=lambda k: (-scores[k], k))
        out[i] = (best, scores[best], scores)
    return out


def test_nb_matches_python_replay(spark):
    train, test = nb_fixture()
    tr = spark.createDataFrame(train, "id long, label string, text string")
    te = spark.createDataFrame(test, "id long, text string")
    model, priors = nb_train(tr)
    got = {r["id"]: r for r in nb_classify(te, model, priors).collect()}
    want = py_nb(train, [(i, t) for i, t in test])
    assert set(got) == set(want)
    for i, (pred, score, _) in want.items():
        assert (got[i]["pred"], got[i]["score_ppm"]) == (pred, score), i


def test_nb_planted_separation_and_floor(spark):
    train, test = nb_fixture()
    tr = spark.createDataFrame(train, "id long, label string, text string")
    te = spark.createDataFrame(test, "id long, text string")
    model, priors = nb_train(tr)
    got = {r["id"]: r["pred"] for r in nb_classify(te, model, priors).collect()}
    assert got[10] == "sport" and got[11] == "law"
    # fully-unseen doc: scores reduce to prior + n*zero_ppm per class
    want = py_nb(train, [(13, "quantum flux")])
    _, _, scores = want[13]
    assert got[13] == min(sorted(scores), key=lambda k: (-scores[k], k))


def test_nb_model_shapes(spark):
    train, _ = nb_fixture()
    tr = spark.createDataFrame(train, "id long, label string, text string")
    model, priors = nb_train(tr)
    vocab = {w for _, _, t in train for w in t.split()}
    assert model.count() == 2 * len(vocab)  # dense class x vocab grid
    assert priors.count() == 2
    # every class's zero floor is strictly below any observed token prob
    rows = model.collect()
    floor = {r["k"]: r["zero_ppm"] for r in rows}
    for r in rows:
        assert r["tok_ppm"] >= floor[r["k"]]
