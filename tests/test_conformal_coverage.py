"""Split conformal prediction (evaluation/conformal.py) and crawl
coverage estimation (etl/coverage.py) gates: brute Python replay of the
k-th-smallest calibration quantile, the finite-sample coverage
guarantee on the planted fixture, the k>n infinite-interval contract,
hand-computed Chapman/Chao1 values, and the A==B capture-recapture
identity."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spanluke_spark.etl.coverage import (
    chao1_richness,
    chapman_estimate,
    crawl_coverage,
)
from spanluke_spark.evaluation.conformal import (
    conformal_qhat,
    split_conformal,
)


def planted_rows(n=300):
    rows = []
    for i in range(n):
        y = 1000 + (i * 37) % 400
        pred = y + (i * 2654435761) % 97 - 48  # residual in [-48, 48]
        rows.append((i, y, pred, i % 3 == 0))
    return rows


def test_qhat_matches_python_kth_smallest(spark):
    rows = planted_rows()
    df = spark.createDataFrame(rows, "id long, y long, pred long, is_calib boolean")
    got = conformal_qhat(
        df.where("is_calib").select(F.abs(F.col("y") - F.col("pred")).alias("score")),
        alpha_num=1,
        alpha_den=10,
    ).collect()[0]
    scores = sorted(abs(y - p) for _, y, p, c in rows if c)
    n = len(scores)
    k = math.ceil((n + 1) * 0.9)
    assert got["n_calib"] == n
    assert got["k"] == k
    assert got["qhat"] == scores[k - 1]


def test_split_conformal_coverage_guarantee_and_replay(spark):
    rows = planted_rows()
    df = spark.createDataFrame(rows, "id long, y long, pred long, is_calib boolean")
    out = split_conformal(df, "pred", "y", "is_calib", 1, 10).collect()
    scores = sorted(abs(y - p) for _, y, p, c in rows if c)
    k = math.ceil((len(scores) + 1) * 0.9)
    qhat = scores[k - 1]
    test_rows = [(i, y, p) for i, y, p, c in rows if not c]
    assert len(out) == len(test_rows)
    by_id = {r["id"]: r for r in out}
    n_cov = 0
    for i, y, p in test_rows:
        r = by_id[i]
        assert r["qhat"] == qhat
        assert r["lo"] == p - qhat and r["hi"] == p + qhat
        want_cov = p - qhat <= y <= p + qhat
        assert r["covered"] == want_cov
        n_cov += want_cov
    r0 = out[0]
    assert r0["coverage_num"] == n_cov
    assert r0["coverage_den"] == len(test_rows)
    # finite-sample marginal guarantee (exchangeable planted residuals)
    assert n_cov / len(test_rows) >= 0.85


def test_k_greater_than_n_gives_infinite_interval(spark):
    # n=3 calibration points, alpha=1/10: k = ceil(4*0.9) = 4 > 3
    rows = [(0, 10, 12, True), (1, 10, 9, True), (2, 10, 10, True), (3, 10, 15, False)]
    df = spark.createDataFrame(rows, "id long, y long, pred long, is_calib boolean")
    out = split_conformal(df, "pred", "y", "is_calib", 1, 10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["qhat"] is None and r["lo"] is None and r["hi"] is None
    assert r["covered"] is True  # infinite interval always covers


def test_chapman_hand_example_and_identity(spark):
    # ecology textbook shape: 10 marked, 15 recaptured, 5 overlap
    a = spark.createDataFrame([(f"a{i}",) for i in range(10)], "item string")
    b = spark.createDataFrame(
        [(f"a{i}",) for i in range(5)] + [(f"b{i}",) for i in range(10)],
        "item string",
    )
    r = chapman_estimate(a, b).collect()[0]
    assert (r["n_a"], r["n_b"], r["m_overlap"]) == (10, 15, 5)
    assert r["chapman_num"] == 11 * 16 and r["chapman_den"] == 6
    assert r["n_hat"] == 11 * 16 // 6 - 1  # 28 (floor of 28.33)
    # A == B: estimator returns exactly n
    same = chapman_estimate(a, a).collect()[0]
    assert same["n_hat"] == 10


def test_chao1_hand_example(spark):
    occ = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("c",)] + [("d",)] * 5, "item string"
    )
    r = chao1_richness(occ).collect()[0]
    assert (r["s_obs"], r["f1"], r["f2"]) == (4, 2, 1)
    assert r["chao1_num"] == 2 and r["chao1_den"] == 4
    assert r["s_chao1"] == 4  # 4 + floor(0.5)


def test_chao1_no_singletons_is_exact(spark):
    occ = spark.createDataFrame([("a",), ("a",), ("b",), ("b",)], "item string")
    r = chao1_richness(occ).collect()[0]
    assert r["f1"] == 0 and r["s_chao1"] == r["s_obs"] == 2


def test_crawl_coverage_composition(spark):
    a = spark.createDataFrame([(w,) for w in "x y z x".split()], "item string")
    b = spark.createDataFrame([(w,) for w in "y z w".split()], "item string")
    r = crawl_coverage(a, b).collect()[0]
    # distinct: A={x,y,z} B={y,z,w} overlap 2; Chapman = 4*4/3-1 = 4 (floor 5.33-1)
    assert (r["n_a"], r["n_b"], r["m_overlap"]) == (3, 3, 2)
    assert r["n_hat"] == 16 // 3 - 1
    # pooled occurrences: x:2 y:2 z:2 w:1 -> s_obs 4, f1 1, f2 3
    assert (r["s_obs"], r["f1"], r["f2"]) == (4, 1, 3)
    assert r["s_chao1"] == 4
    # coverage = s_obs / (16/3 - 1) = 4*3/13
    assert r["coverage_ppm"] == 4 * 3 * 1000000 // 13
