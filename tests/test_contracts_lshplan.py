"""Data-contract validation + LSH parameter planner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import lsh_parameter_plan
from spanluke_spark.storage.contracts import (
    validate_ref_integrity,
    validate_rows,
    validate_unique,
)


def test_validate_rows_one_scan_null_is_violation(spark):
    df = spark.createDataFrame(
        [(1, "en", 10), (2, None, -5), (3, "de", 7), (4, "en", None)],
        "id long, lang string, n int",
    )
    rep = {r.check: r for r in validate_rows(df, {
        "lang_not_null": F.col("lang").isNotNull(),
        "n_positive": F.col("n") > 0,
    }).collect()}
    assert rep["lang_not_null"].n_violations == 1
    # -5 fails, NULL n fails (NULL -> violation)
    assert rep["n_positive"].n_violations == 2
    assert rep["n_positive"].violation_frac == pytest.approx(0.5)
    assert not rep["n_positive"].passed
    assert rep["lang_not_null"].n_rows == 4


def test_validate_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d")], "k long, v string"
    )
    r = validate_unique(df, ["k"]).collect()[0]
    assert (r.n_rows, r.n_violations, r.passed) == (4, 2, False)
    ok = validate_unique(df, ["k", "v"]).collect()[0]
    assert ok.passed


def test_validate_ref_integrity(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = validate_ref_integrity(child, parent, "fk", "pk").collect()[0]
    # NULL skipped; two 1s + one 2 ok; 9 orphaned
    assert (r.n_rows, r.n_violations) == (4, 1)
    assert r.violation_frac == pytest.approx(0.25)


def test_lsh_parameter_plan_matches_closed_form(spark):
    plan = lsh_parameter_plan(spark, n_hashes=16, target_jaccard=0.8)
    rows = plan.collect()
    # every divisor split present
    assert {(r.bands, r.rows) for r in rows} == {
        (1, 16), (2, 8), (4, 4), (8, 2), (16, 1)
    }
    by = {(r.bands, r.rows, round(r.s, 1)): r for r in rows}
    r48 = by[(4, 4, 0.8)]
    assert r48.p_candidate == pytest.approx(1 - (1 - 0.8 ** 4) ** 4)
    assert r48.threshold == pytest.approx((1 / 4) ** (1 / 4))
    assert r48.p_at_target == pytest.approx(1 - (1 - 0.8 ** 4) ** 4)
    # monotone in s for fixed (b, r)
    curve = [by[(8, 2, round(0.1 * i, 1))].p_candidate for i in range(1, 10)]
    assert curve == sorted(curve)
