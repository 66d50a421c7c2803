"""Change-rate estimation: hand-computed MLE, the X=n clamp, the
never-changed and single-capture lanes."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.etl.recrawl import change_rate


def _caps(spark, rows):
    return spark.createDataFrame(rows, "url string, ts long, digest string")


def test_hand_computed_lambda(spark):
    rows = [("u", 0, "a"), ("u", 7, "a"), ("u", 14, "b"), ("u", 21, "b")]
    r = change_rate(_caps(spark, rows)).collect()[0]
    assert (r.n_obs, r.n_changes) == (4, 1)
    lam = -math.log(1 - 1 / 3) / 7.0
    assert r.lambda_hat == pytest.approx(round(lam, 6))
    assert r.recrawl_interval == pytest.approx(round(1 / lam, 6))


def test_always_changing_clamped(spark):
    rows = [("u", 0, "a"), ("u", 1, "b"), ("u", 2, "c")]
    r = change_rate(_caps(spark, rows)).collect()[0]
    # X = n = 2 -> ratio clamped to (2 - 0.5)/2 = 0.75
    lam = -math.log(0.25) / 1.0
    assert r.lambda_hat == pytest.approx(round(lam, 6))


def test_never_changed_is_plus_zero(spark):
    rows = [("u", 0, "a"), ("u", 5, "a"), ("u", 10, "a")]
    r = change_rate(_caps(spark, rows)).collect()[0]
    assert r.lambda_hat == 0.0 and math.copysign(1, r.lambda_hat) == 1.0
    assert r.recrawl_interval is None  # no evidence of change -> no interval


def test_single_capture_null(spark):
    rows = [("u", 0, "a")]
    r = change_rate(_caps(spark, rows)).collect()[0]
    assert r.n_obs == 1 and r.lambda_hat is None and r.recrawl_interval is None


def test_unordered_input_and_same_ts_span_zero(spark):
    # out-of-order rows are sorted by ts inside the window
    rows = [("u", 14, "b"), ("u", 0, "a"), ("u", 7, "a")]
    r = change_rate(_caps(spark, rows)).collect()[0]
    assert r.n_changes == 1
    # all captures at one instant -> delta 0 -> NULL (guarded division)
    z = change_rate(_caps(spark, [("z", 3, "a"), ("z", 3, "b")])).collect()[0]
    assert z.lambda_hat is None
