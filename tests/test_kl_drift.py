"""Vocabulary KL drift — zero on identical snapshots, numpy parity on a
mixed fixture, asymmetry direction on planted emerging vocabulary, and
the empty-side NULL contract."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from spanluke_spark.textops.profile import vocabulary_kl_drift


def _run(spark, texts_old, texts_new, alpha=1):
    rows = [(0, t) for t in texts_old] + [(1, t) for t in texts_new]
    df = spark.createDataFrame(rows, "g: int, text: string")
    out = vocabulary_kl_drift(df, is_new=F.col("g") == 1, alpha=alpha)
    return out.collect()[0]


def _numpy_kl(texts_old, texts_new, alpha=1):
    tok = lambda ts: [w for t in ts for w in "".join(
        c if c.isalpha() else " " for c in t.lower()).split()]
    co, cn = Counter(tok(texts_old)), Counter(tok(texts_new))
    vocab = set(co) | set(cn)
    v, no, nn = len(vocab), sum(co.values()), sum(cn.values())
    kl_no = kl_on = 0.0
    for w in vocab:
        pn = (cn[w] + alpha) / (nn + alpha * v)
        po = (co[w] + alpha) / (no + alpha * v)
        kl_no += pn * math.log(pn / po)
        kl_on += po * math.log(po / pn)
    return v, no, nn, kl_no, kl_on


def test_identical_snapshots_zero_drift(spark):
    texts = ["the cat sat", "on the mat", "cats and mats"]
    r = _run(spark, texts, texts)
    assert r["kl_new_vs_old"] == 0.0 and r["kl_old_vs_new"] == 0.0


def test_numpy_parity(spark):
    old = ["alpha beta gamma beta", "delta alpha", "beta beta epsilon"]
    new = ["alpha zeta zeta", "gamma zeta eta alpha", "eta theta"]
    r = _run(spark, old, new)
    v, no, nn, kl_no, kl_on = _numpy_kl(old, new)
    assert (r["vocab_size"], r["n_old_tokens"], r["n_new_tokens"]) == (v, no, nn)
    assert r["kl_new_vs_old"] == round(kl_no, 6)
    assert r["kl_old_vs_new"] == round(kl_on, 6)
    # both divergences strictly positive on genuinely different corpora
    assert r["kl_new_vs_old"] > 0 and r["kl_old_vs_new"] > 0


def test_emerging_vocabulary_spikes_new_vs_old(spark):
    # new snapshot introduces a heavy novel word; shared base identical.
    # KL(new||old) weights the novel word by its LARGE new-side mass,
    # KL(old||new) only by its smoothed old-side mass -> asymmetry.
    base = ["common words here common words"]
    r = _run(spark, base, base + ["novelterm novelterm novelterm novelterm"])
    assert r["kl_new_vs_old"] > r["kl_old_vs_new"] > 0


def test_empty_side_yields_nulls(spark):
    r = _run(spark, ["some words"], ["1234 5678"])  # new side tokenizes empty
    assert r["kl_new_vs_old"] is None and r["kl_old_vs_new"] is None
    assert r["n_new_tokens"] == 0 and r["n_old_tokens"] == 2
