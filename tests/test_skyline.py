"""2-D skyline — O(n^2) dominance brute-force parity on random points
with duplicates and axis ties, the strictly-dominated exclusion, and
the coordinate-duplicate survival rule."""

from __future__ import annotations

import random

from spanluke_spark.textops.skyline import skyline_2d


def _brute(points):
    out = {}
    for i, (x, y) in points.items():
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (x2, y2) in points.items()
            if j != i and not (x2 == x and y2 == y)
        )
        out[i] = not dominated
    return out


def _spark_sky(spark, points):
    rows = [(i, x, y) for i, (x, y) in points.items()]
    df = spark.createDataFrame(rows, "pid: long, x: long, y: long")
    return {
        r["pid"]: r["on_skyline"] for r in skyline_2d(df).collect()
    }


def test_matches_bruteforce(spark):
    for seed in (1, 5, 12):
        rng = random.Random(seed)
        points = {
            i: (rng.randrange(12), rng.randrange(12)) for i in range(60)
        }
        assert _spark_sky(spark, points) == _brute(points), seed


def test_duplicate_coordinates_survive_together(spark):
    points = {0: (5, 5), 1: (5, 5), 2: (3, 3)}
    got = _spark_sky(spark, points)
    assert got == {0: True, 1: True, 2: False}


def test_axis_tie_dominance(spark):
    # same x, higher y dominates; same y, higher x dominates
    points = {0: (5, 9), 1: (5, 4), 2: (7, 4)}
    got = _spark_sky(spark, points)
    assert got == {0: True, 1: False, 2: True}
