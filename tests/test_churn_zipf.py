"""Snapshot churn per predicate + Zipf spectrum fit."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.graph.snapshot import snapshot_churn
from spanluke_spark.textops.profile import zipf_fit

_T = "subj string, pred string, obj string"


def test_snapshot_churn_hand_computed(spark):
    old = spark.createDataFrame(
        [
            ("a", "p", "1"), ("b", "p", "2"), ("c", "p", "3"),
            ("a", "q", "x"),
        ],
        _T,
    )
    new = spark.createDataFrame(
        [
            ("a", "p", "1"),       # unchanged
            ("b", "p", "CHANGED"),  # changed
            ("d", "p", "9"),        # added; c removed
            ("a", "q", "x"),        # q untouched
            ("e", "r", "z"),        # brand-new predicate
        ],
        _T,
    )
    rows = {r.pred: r for r in snapshot_churn(old, new).collect()}
    p = rows["p"]
    assert (p.n_old, p.n_added, p.n_removed, p.n_changed) == (3, 1, 1, 1)
    assert p.churn == pytest.approx(1.0)
    q = rows["q"]
    assert (q.n_old, q.n_added, q.n_removed, q.n_changed) == (1, 0, 0, 0)
    assert q.churn == 0.0
    r = rows["r"]
    assert (r.n_old, r.n_added) == (0, 1) and r.churn is None


def test_zipf_fit_matches_numpy_reference(spark):
    import numpy as np

    docs = [
        "the the the the cat cat dog bird bird bird",
        "the cat sat on on the mat",
    ]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = zipf_fit(df).collect()[0]

    from collections import Counter
    tf = Counter(" ".join(docs).split())
    spec = Counter(tf.values())
    cum, xs, ys, ws = 0, [], [], []
    for freq in sorted(spec, reverse=True):
        n = spec[freq]
        cum += n
        mid = (cum - n + 1 + cum) / 2.0
        xs.append(math.log(mid)); ys.append(math.log(freq)); ws.append(n)
    xs, ys, ws = map(np.array, (xs, ys, ws))
    sw, sx, sy = ws.sum(), (ws * xs).sum(), (ws * ys).sum()
    sxx, sxy = (ws * xs * xs).sum(), (ws * xs * ys).sum()
    slope = (sxy - sx * sy / sw) / (sxx - sx * sx / sw)
    inter = (sy - slope * sx) / sw

    assert got.slope == pytest.approx(slope)
    assert got.intercept == pytest.approx(inter)
    assert got.n_terms == len(tf)
    assert got.n_tokens == sum(tf.values())
    assert got.n_freq_classes == len(spec)


def test_zipf_natural_text_slope_negative(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = zipf_fit(docs).collect()[0]
    # the testdata corpus is a 31-word synthetic soup, so the decay is
    # shallow — assert the direction, not a natural-language magnitude
    assert row.slope < 0
    assert row.n_tokens > row.n_terms
