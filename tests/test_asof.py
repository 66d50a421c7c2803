"""As-of join vs a pure-Python oracle: inclusivity, no-match, tolerance."""

from __future__ import annotations

import datetime as dt

from spanluke_spark.etl.asof import asof_join

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def _left(spark):
    rows = [(1, 7, _ts(5)), (2, 7, _ts(10)), (3, 7, _ts(2)), (4, 9, _ts(8)), (5, 8, _ts(1))]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def _right(spark):
    rows = [(7, _ts(2), 100.0), (7, _ts(9), 200.0), (9, _ts(8), 300.0), (9, _ts(20), 400.0)]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, v double")


def test_asof_join_matches_python_oracle(spark):
    got = {
        r["event_id"]: (r["right_ts"], r["right_v"])
        for r in asof_join(_left(spark), _right(spark), on="user_id").collect()
    }
    assert got[1] == (_ts(2), 100.0)   # latest right at/before 5 is ts=2
    assert got[2] == (_ts(9), 200.0)
    assert got[3] == (_ts(2), 100.0)   # INCLUSIVE: right at exactly left.ts
    assert got[4] == (_ts(8), 300.0)   # inclusive equal-ts for user 9 too
    assert got[5] == (None, None)      # user 8 has no rights


def test_asof_join_tolerance(spark):
    got = {
        r["event_id"]: (r["right_ts"], r["right_v"])
        for r in asof_join(
            _left(spark), _right(spark), on="user_id", tolerance="2 MINUTES"
        ).collect()
    }
    assert got[1] == (None, None)      # ts=2 is 3 min before 5 -> stale
    assert got[2] == (_ts(9), 200.0)   # 1 min gap -> within tolerance
    assert got[3] == (_ts(2), 100.0)   # 0 gap
    assert got[5] == (None, None)


def test_asof_join_preserves_left_columns_and_count(spark):
    base = _left(spark)
    left = base.withColumn("payload", base.event_id * 10)
    out = asof_join(left, _right(spark), on="user_id")
    assert out.count() == 5
    assert set(out.columns) == {"event_id", "user_id", "ts", "payload", "right_ts", "right_v"}
    assert {r["payload"] for r in out.collect()} == {10, 20, 30, 40, 50}


def test_asof_join_null_right_value_comes_from_matched_row(spark):
    """Native ASOF semantics: when the matched right row's value is NULL, the
    join returns that NULL — it must not reach back to an older non-null
    value, and right_ts/right_v must come from the SAME right row."""
    left = spark.createDataFrame(
        [(1, 7, _ts(10))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(7, _ts(2), 100.0), (7, _ts(9), None)],
        "user_id long, ts timestamp, v double",
    )
    row = asof_join(left, right, on="user_id").collect()[0]
    assert row["right_ts"] == _ts(9)
    assert row["right_v"] is None


def test_asof_join_hypothesis_random_vs_python_oracle(spark):
    """Property: for random (key, ts) data the window formulation equals the
    brute-force per-row max-right-at-or-before lookup, including NULL value
    rows and duplicate-free gold construction."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 40)),
            min_size=1, max_size=12, unique=True,
        ),
        st.lists(
            st.tuples(
                st.integers(0, 3),
                st.integers(0, 40),
                st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
            ),
            max_size=12,
            unique_by=lambda r: (r[0], r[1]),
        ),
    )
    def check(lrows, rrows):
        left = spark.createDataFrame(
            [(i, k, _ts(t)) for i, (k, t) in enumerate(lrows)],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(k, _ts(t), v) for (k, t, v) in rrows] or [(99, _ts(0), 0.0)],
            "user_id long, ts timestamp, v double",
        )
        got = {
            r["event_id"]: (r["right_ts"], r["right_v"])
            for r in asof_join(left, right, on="user_id").collect()
        }
        rr = rrows or [(99, 0, 0.0)]
        for i, (k, t) in enumerate(lrows):
            cands = [(rt, v) for (rk, rt, v) in rr if rk == k and rt <= t]
            want = max(cands, key=lambda c: c[0]) if cands else None
            if want is None:
                assert got[i] == (None, None), (i, got[i])
            else:
                assert got[i] == (_ts(want[0]), want[1]), (i, got[i], want)

    check()
