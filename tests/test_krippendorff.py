"""Krippendorff's alpha — Python replay parity on random multi-coder
data with missing annotations, the perfect-agreement / maximal-
disagreement anchors, coder-name invariance, and the unpairable-item
exclusion rule."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest

from spanluke_spark.evaluation.agreement import krippendorff_alpha


def _py_alpha(rows):
    by_item = defaultdict(dict)
    for i, coder, lbl in rows:
        by_item[i][coder] = lbl
    o: Counter = Counter()
    for vals in by_item.values():
        labs = list(vals.values())
        m = len(labs)
        if m < 2:
            continue
        for x in range(m):
            for y in range(m):
                if x != y:
                    o[(labs[x], labs[y])] += 1.0 / (m - 1)
    n = sum(o.values())
    if n == 0:
        return None
    onum = sum(w for (a, b), w in o.items() if a != b)
    nc: Counter = Counter()
    for (a, _), w in o.items():
        nc[a] += w
    enum = sum(
        nc[a] * nc[b] for a in nc for b in nc if a != b
    )
    de = enum / (n * (n - 1))
    if de == 0:
        return (n, onum / n, de, None)
    return (n, onum / n, de, 1 - (onum / n) / de)


def _spark_alpha(spark, rows):
    df = spark.createDataFrame(rows, "item: long, coder: string, label: string")
    r = krippendorff_alpha(df).collect()[0]
    return (r["n_coincidences"], r["do_rate"], r["de_rate"], r["alpha"])


def _rand_rows(seed: int, n_items: int, coders=("c0", "c1", "c2", "c3")):
    rng = random.Random(seed)
    rows = []
    for i in range(n_items):
        for c in coders:
            if rng.random() < 0.7:
                rows.append((i, c, f"l{rng.randrange(4)}"))
    return rows


@pytest.mark.parametrize("seed", [1, 2, 9])
def test_matches_python_replay(spark, seed):
    rows = _rand_rows(seed, 50)
    got = _spark_alpha(spark, rows)
    want = _py_alpha(rows)
    for g, w in zip(got, want):
        assert g == pytest.approx(w, abs=2e-6)


def test_perfect_agreement_is_one(spark):
    rows = [(i, c, f"l{i % 3}") for i in range(20) for c in ("a", "b", "c")]
    assert _spark_alpha(spark, rows)[3] == pytest.approx(1.0)


def test_constant_labels_give_null_alpha(spark):
    rows = [(i, c, "same") for i in range(10) for c in ("a", "b")]
    assert _spark_alpha(spark, rows)[3] is None


def test_coder_names_do_not_matter(spark):
    rows = _rand_rows(4, 40)
    renamed = [(i, "x" + c, lbl) for i, c, lbl in rows]
    assert _spark_alpha(spark, rows) == _spark_alpha(spark, renamed)


def test_single_annotation_items_excluded(spark):
    base = _rand_rows(6, 30)
    extra = [(1000 + j, "a", f"l{j % 4}") for j in range(15)]
    assert _spark_alpha(spark, base + extra) == _spark_alpha(spark, base)
