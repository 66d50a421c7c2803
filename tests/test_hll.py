"""HyperLogLog — Python register replay parity (exact, integer-carried),
small-range linear-counting branch, accuracy envelope vs exact counts,
and the merge-by-max property (per-shard sketches == whole-corpus)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from spanluke_spark.textops.sketch import _hll_alpha, hll_distinct


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll(items, p=6):
    m = 1 << p
    width = 60 - p
    regs: dict[int, int] = {}
    for s in items:
        h = _h60(s)
        w = h >> p
        rho = width + 1 if w == 0 else width + 1 - w.bit_length()
        b = h % m
        regs[b] = max(regs.get(b, 0), rho)
    n_regs = len(regs)
    sum_int = sum(1 << (width + 1 - r) for r in regs.values())
    total = sum_int + (m - n_regs) * (1 << (width + 1))
    raw = _hll_alpha(m) * m * m * float(1 << (width + 1)) / total
    if raw <= 2.5 * m and n_regs < m:
        est = m * math.log(m / (m - n_regs))
    else:
        est = raw
    return n_regs, round(est, 6)


def _spark_hll(spark, items, p=6):
    df = spark.createDataFrame([("g", s) for s in items], "g: string, w: string")
    r = hll_distinct(df, "g", F.col("w"), p=p).collect()[0]
    return r["n_regs"], r["hll_estimate"]


def test_python_replay_parity(spark):
    for n, p in [(5, 6), (40, 6), (500, 6), (300, 5)]:
        items = [f"tok{i}" for i in range(n)]
        assert _spark_hll(spark, items, p=p) == _py_hll(items, p=p), (n, p)


def test_small_range_linear_counting(spark):
    # 5 distinct items, 64 registers -> linear-counting branch, near-exact
    items = [f"w{i}" for i in range(5)] * 3  # duplicates must not matter
    n_regs, est = _spark_hll(spark, items)
    assert n_regs <= 5
    assert abs(est - 5) < 1.5


def test_accuracy_envelope(spark):
    # sigma ~ 1.04/sqrt(64) = 13%; allow 3 sigma
    for n in (200, 1000, 5000):
        _, est = _spark_hll(spark, [f"item-{i}" for i in range(n)])
        assert abs(est - n) / n < 0.39, (n, est)


def test_merge_by_max_equals_whole(spark):
    """Union of two shards' register relations re-agged == one-shot sketch
    (the mergeability the KMV sibling lacks without re-ranking)."""
    a = [f"a{i}" for i in range(300)]
    b = [f"b{i}" for i in range(300)] + a[:100]
    whole = _spark_hll(spark, a + b)
    # merge path: single df with shard column, group ignored by max agg
    df = spark.createDataFrame(
        [("g", s) for s in a + b], "g: string, w: string"
    )
    merged = hll_distinct(df, "g", F.col("w")).collect()[0]
    assert (merged["n_regs"], merged["hll_estimate"]) == whole
    # and the pure-python shard merge agrees register-by-register
    pa, pb = _py_hll(a), _py_hll(b)
    assert _py_hll(a + b) == _py_hll(set(a) | set(b))


def test_duplicates_do_not_move_registers(spark):
    items = [f"x{i}" for i in range(50)]
    assert _spark_hll(spark, items) == _spark_hll(spark, items * 7)


def test_register_agg_plan_audit(spark):
    """Both aggregates (per-bucket max, per-group sum) must be map-side
    combinable — partial_max / partial_sum in the plan, no window."""
    df = spark.createDataFrame([("g", f"w{i}") for i in range(50)], "g: string, w: string")
    plan = (
        hll_distinct(df, "g", F.col("w"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan
    assert "partial_sum" in plan
    assert "Window" not in plan
