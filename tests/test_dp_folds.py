"""Gates for etl/dp.py: knapsack against brute-force subset
enumeration (all 2^n at n = 12), the 0/1 semantics witness (an item
never reused — a repeatable-item DP would score higher on the
crafted fixture), greedy-density-beaten lane, zero-capacity and
all-fit closed forms; LIS against an O(n^2) DP replay, monotone
== n, reversed == 1, duplicate-plateau strictness, and the
LIS >= records dominance against the records test."""

from __future__ import annotations

from itertools import combinations

from spanluke_spark.etl.dp import knapsack, lis_length

# ---------------------------------------------------- python replays


def brute_knapsack(items, cap):
    best = 0
    for r in range(len(items) + 1):
        for sub in combinations(items, r):
            w = sum(x[1] for x in sub)
            if w <= cap:
                best = max(best, sum(x[2] for x in sub))
    return best


def py_lis(xs):
    if not xs:
        return 0
    dp = [1] * len(xs)
    for i in range(len(xs)):
        for j in range(i):
            if xs[j] < xs[i]:
                dp[i] = max(dp[i], dp[j] + 1)
    return max(dp)


def _run_kn(spark, items, cap):
    df = spark.createDataFrame(list(items), "id long, w long, v long")
    return knapsack(df, cap).collect()[0].asDict()


def _run_lis(spark, xs):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return lis_length(df).collect()[0].asDict()


ITEMS = [(i, 1 + (i * 7) % 9, 1 + (i * 5) % 11) for i in range(12)]


def test_knapsack_matches_brute_force(spark):
    for cap in (0, 7, 15, 30, 100):
        got = _run_kn(spark, ITEMS, cap)
        assert got["best_value"] == brute_knapsack(ITEMS, cap), cap


def test_knapsack_zero_one_semantics(spark):
    # one light high-value item: repeatable DP would take it 5x
    items = [(1, 2, 10), (2, 9, 11)]
    got = _run_kn(spark, items, 10)
    assert got["best_value"] == 11  # 2x item1 (20) would be illegal...
    # capacity 10 fits item2 alone (11) or item1 once (10)
    got4 = _run_kn(spark, items, 4)
    assert got4["best_value"] == 10  # item1 once, NOT twice


def test_knapsack_beats_greedy_density(spark):
    # greedy-by-density takes (5, 10) d=2.0 then nothing fits;
    # optimal is (4, 9) + (3, 7) = 16
    items = [(1, 5, 10), (2, 4, 9), (3, 3, 7)]
    got = _run_kn(spark, items, 7)
    assert got["best_value"] == 16


def test_knapsack_all_fit(spark):
    got = _run_kn(spark, ITEMS, 10_000)
    assert got["best_value"] == got["total_v"]


def test_lis_matches_dp(spark):
    for xs in (
        [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5],
        [(i * 17) % 23 for i in range(30)],
        [(i * i * 7 + i) % 31 for i in range(25)],
    ):
        assert _run_lis(spark, xs)["lis_len"] == py_lis(xs)


def test_lis_closed_forms(spark):
    assert _run_lis(spark, list(range(20)))["lis_len"] == 20
    assert _run_lis(spark, list(range(20, 0, -1)))["lis_len"] == 1
    assert _run_lis(spark, [5, 5, 5, 5])["lis_len"] == 1  # strict


def test_lis_dominates_records(spark):
    from spanluke_spark.evaluation.quade import records_test

    xs = [(i * 13) % 97 + i // 10 for i in range(80)]
    lis = _run_lis(spark, xs)["lis_len"]
    rec_df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    recs = records_test(rec_df).collect()[0]["n_records"]
    # prefix maxima form one increasing subsequence
    assert lis >= recs
