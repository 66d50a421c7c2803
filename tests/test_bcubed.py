"""B-cubed clustering evaluation — hand-computed goldens for the three
boundary clusterings (perfect, all-merged, all-singletons) and a
brute-force per-item parity check on a mixed fixture, confirming the
cell-closed form equals the definitional item average."""

from __future__ import annotations

from collections import Counter

import pytest

from spanluke_spark.evaluation.dedup_eval import bcubed


def _df(spark, rows):
    return spark.createDataFrame(rows, "id: long, gold: long, sys: long")


def _run(spark, rows):
    r = bcubed(_df(spark, rows)).collect()[0]
    return r["n_items"], r["precision"], r["recall"], r["f1"]


def _brute(rows):
    gold = {i: g for i, g, _ in rows}
    sysc = {i: s for i, _, s in rows}
    gsz, ssz = Counter(gold.values()), Counter(sysc.values())
    cell = Counter((gold[i], sysc[i]) for i in gold)
    n = len(rows)
    p = sum(cell[(gold[i], sysc[i])] / ssz[sysc[i]] for i in gold) / n
    r = sum(cell[(gold[i], sysc[i])] / gsz[gold[i]] for i in gold) / n
    return p, r


def test_perfect_clustering_is_all_ones(spark):
    rows = [(i, i % 3, (i % 3) + 10) for i in range(9)]
    assert _run(spark, rows) == (9, 1.0, 1.0, 1.0)


def test_all_merged_recall_one_precision_penalized(spark):
    # gold clusters of sizes 4 and 2, system puts all 6 in one cluster:
    # recall = 1, precision = (4^2 + 2^2) / 6^2 = 20/36
    rows = [(i, 0 if i < 4 else 1, 7) for i in range(6)]
    n, p, r, f1 = _run(spark, rows)
    assert (n, r) == (6, 1.0)
    assert p == round(20 / 36, 6)
    assert f1 == round(2 * (20 / 36) / (1 + 20 / 36), 6)


def test_all_singletons_precision_one(spark):
    # symmetric case: precision = 1, recall = sum n_c / n_c^2... per item
    # R(e) = 1/|gold(e)| -> recall = (4*(1/4) + 2*(1/2)) / 6 = 2/6
    rows = [(i, 0 if i < 4 else 1, 100 + i) for i in range(6)]
    n, p, r, f1 = _run(spark, rows)
    assert (n, p) == (6, 1.0)
    assert r == round(2 / 6, 6)


def test_giant_wrong_merge_punished_per_item(spark):
    # one system cluster swallows a 10-item gold cluster plus 10
    # singleton-gold items: the brute-force definitional average must
    # match the relational cell form exactly
    rows = [(i, 0 if i < 10 else i, 0) for i in range(20)]
    rows += [(100 + i, 50 + i % 2, 50 + i % 3) for i in range(12)]
    n, p, r, f1 = _run(spark, rows)
    bp, br = _brute(rows)
    assert n == 32
    assert p == round(bp, 6) and r == round(br, 6)
    assert f1 == round(2 * bp * br / (bp + br), 6)


def test_degenerate_zero_guard(spark):
    # a single item always scores 1.0 (cells of size 1)
    assert _run(spark, [(0, 5, 9)]) == (1, 1.0, 1.0, 1.0)
