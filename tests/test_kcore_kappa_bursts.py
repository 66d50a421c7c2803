"""k-core peeling, Cohen's kappa, burst detection."""

from __future__ import annotations

import datetime

import pytest

from spanluke_spark.etl.bursts import detect_bursts
from spanluke_spark.evaluation.agreement import cohen_kappa
from spanluke_spark.graph.analytics import k_core


def test_k_core_peels_tail(spark):
    # K4 clique (every node degree 3) + a pendant chain hanging off it
    clique = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    chain = [("d", "e"), ("e", "f")]
    edges = spark.createDataFrame(clique + chain, "src string, dst string")
    core3 = {r.node: r.core_degree for r in k_core(edges, 3).collect()}
    assert core3 == {"a": 3, "b": 3, "c": 3, "d": 3}
    # the chain requires RECURSIVE peeling: e survives round 1 (deg 2)
    # only until f peels; 2-core is the clique exactly
    core2 = set(r.node for r in k_core(edges, 2).collect())
    assert core2 == {"a", "b", "c", "d"}


def test_k_core_empty_when_k_too_large(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    assert k_core(edges, 3).count() == 0


def test_cohen_kappa_hand_computed(spark):
    # classic 2x2: n=100, both say yes 45, both no 25, a-yes/b-no 15,
    # a-no/b-yes 15 -> po=0.7, pa_yes=0.6, pb_yes=0.6, pe=0.52, k=0.375
    rows_a, rows_b = [], []
    i = 0
    for (la, lb), cnt in [
        (("y", "y"), 45), (("n", "n"), 25), (("y", "n"), 15), (("n", "y"), 15)
    ]:
        for _ in range(cnt):
            rows_a.append((i, la)); rows_b.append((i, lb)); i += 1
    a = spark.createDataFrame(rows_a, "item long, label string")
    b = spark.createDataFrame(rows_b, "item long, label string")
    r = cohen_kappa(a, b, ["item"]).collect()[0]
    assert r.n_items == 100
    assert r.p_o == pytest.approx(0.70)
    assert r.p_e == pytest.approx(0.52)
    assert r.kappa == pytest.approx((0.70 - 0.52) / 0.48)


def test_cohen_kappa_perfect_and_degenerate(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "item long, label string")
    r = cohen_kappa(a, a, ["item"]).collect()[0]
    assert r.kappa == pytest.approx(1.0)
    # both constant: pe = 1 -> NULL kappa
    c = spark.createDataFrame([(1, "x"), (2, "x")], "item long, label string")
    r2 = cohen_kappa(c, c, ["item"]).collect()[0]
    assert r2.kappa is None and r2.p_o == 1.0


def test_detect_bursts_flags_spike(spark):
    base = datetime.datetime(2024, 1, 1)
    rows = []
    for day in range(10):
        n = 100 if day == 7 else 10  # day 7 is the burst
        for j in range(n):
            rows.append(("crawl", base + datetime.timedelta(days=day, seconds=j)))
    rows += [("steady", base + datetime.timedelta(days=d)) for d in range(5)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = detect_bursts(ev, z_threshold=2.0).collect()
    bursts = [(r.key, r.bucket_start.day) for r in out if r.is_burst]
    assert bursts == [("crawl", 8)]
    # zero-variance key: NULL zscore, never flagged
    steady = [r for r in out if r.key == "steady"]
    assert all(r.zscore is None and not r.is_burst for r in steady)
