"""Poisson bootstrap CIs (textops/bootstrap.py)."""

from __future__ import annotations

import hashlib
import math

from spanluke_spark.textops.bootstrap import (
    POISSON1_CDF,
    bootstrap_mean_ci,
    poisson_weight,
)


def _py_weight(doc_id, b, M=1 << 30):
    h = int(
        hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()[:15], 16
    )
    u = ((h % M) + 0.5) / M
    for k, c in enumerate(POISSON1_CDF):
        if u < c:
            return k
    return 6


def test_cdf_constants():
    assert abs(POISSON1_CDF[0] - math.exp(-1)) < 1e-15
    assert abs(POISSON1_CDF[5] - 0.9994058151824183) < 1e-12


def test_weights_match_python_replay(spark):
    import pyspark.sql.functions as F

    df = spark.range(50).select(
        F.col("id"),
        F.lit(3).alias("b"),
        poisson_weight(F.col("id"), F.lit(3)).alias("w"),
    )
    got = {r.id: r.w for r in df.collect()}
    for i in range(50):
        assert got[i] == _py_weight(i, 3)


def test_weight_distribution_is_poisson_like(spark):
    import pyspark.sql.functions as F

    df = spark.range(2000).select(
        poisson_weight(F.col("id"), F.lit(0)).alias("w")
    )
    mean = df.agg(F.avg("w")).first()[0]
    zeros = df.where(F.col("w") == 0).count() / 2000
    assert 0.9 < mean < 1.1  # E[Poisson(1)] = 1
    assert 0.32 < zeros < 0.42  # P(0) = e^-1 ~ 0.368


def test_ci_brackets_observed_mean(spark):
    df = spark.createDataFrame(
        [(i, "g", float(100 + (i * 37) % 50)) for i in range(300)],
        "doc_id long, grp string, v double",
    )
    row = bootstrap_mean_ci(df, "v", "grp", n_reps=64).first()
    assert row.ci_lo <= row.mean_obs <= row.ci_hi
    assert row.ci_lo < row.median_boot < row.ci_hi
    assert row.n_docs == 300
    # CI width should be a few standard errors, not degenerate or huge
    assert 0.1 < row.ci_hi - row.ci_lo < 20.0


def test_deterministic_across_runs(spark):
    df = spark.createDataFrame(
        [(i, "g", float(i % 17)) for i in range(100)],
        "doc_id long, grp string, v double",
    )
    a = bootstrap_mean_ci(df, "v", "grp", n_reps=32).first()
    b = bootstrap_mean_ci(df.repartition(7), "v", "grp", n_reps=32).first()
    assert (a.ci_lo, a.median_boot, a.ci_hi) == (b.ci_lo, b.median_boot, b.ci_hi)
