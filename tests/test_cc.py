"""Connected components vs union-find oracle (SURVEY §5.2.4)."""

import random

from spanluke_spark.canon.cc import connected_components, py_union_find


def _check(spark, edges):
    """Both execution paths must agree with the union-find oracle: the
    driver-side hybrid (default threshold) AND the distributed alternating-
    star algorithm (driver_threshold=0 forces it)."""
    expected = py_union_find(edges)
    df = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        df = df.limit(0)
    for thr in (100_000, 0):
        got = {
            r.node: r.component
            for r in connected_components(df, driver_threshold=thr).collect()
        }
        assert got == expected, (thr, sorted(got.items())[:10], sorted(expected.items())[:10])


def test_cc_shapes(spark):
    # chain, star, clique, isolated self-loop, duplicate + reversed edges
    chain = [(i, i + 1) for i in range(10, 20)]
    star = [(100, v) for v in range(101, 110)]
    clique = [(a, b) for a in range(200, 205) for b in range(200, 205) if a < b]
    extras = [(300, 300), (40, 41), (41, 40), (40, 41)]
    _check(spark, chain + star + clique + extras)


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(10, 80))
        ]
        _check(spark, edges)


def test_cc_two_giant_components(spark):
    # two long chains connected by hubs — exercises multi-round convergence
    a = [(i, i + 1) for i in range(0, 30)]
    b = [(i, i + 1) for i in range(1000, 1030)]
    _check(spark, a + b)
