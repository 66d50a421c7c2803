"""Gates for etl/charts.py: EWMA against an exact quantized-
recursion replay, the stable-stream-silent / planted-shift-alarms
pair with alarm latency after onset, zero-baseline-variance NULL;
Page-Hinkley against a window replay, the same silent/alarm pair,
the delta-tolerance property (a drift smaller than delta stays
silent forever), and the n <= k nothing-to-monitor lane."""

from __future__ import annotations

from spanluke_spark.etl.charts import ewma_chart, page_hinkley

# ---------------------------------------------------- python replays


def py_ewma(xs, k):
    n = len(xs)
    sk = sum(xs[:k])
    qk = sum(v * v for v in xs[:k])
    mu0 = 1000 * sk // k
    a = k * qk - sk * sk
    s2m = 10**6 * a // (k * (k - 1)) if k >= 2 else None
    out = {"n": n, "k": k, "mu0_milli": mu0, "s2m": s2m}
    if not s2m or s2m <= 0:
        return {**out, "n_alarms": None, "first_alarm_t": None}
    z = mu0
    hits = []
    for i, x in enumerate(xs, start=1):
        z = (3 * z + 1000 * x) // 4
        if i > k and (z - mu0) ** 2 * 7 > 9 * s2m:
            hits.append(i - 1)  # t is the 0-based index fixture
    return {
        **out,
        "n_alarms": len(hits),
        "first_alarm_t": hits[0] if hits else None,
    }


def py_ph(xs, k, delta=500, lam=30_000):
    sk = sum(xs[:k])
    mu0 = 1000 * sk // k
    m = 0
    mmin = 0
    max_gap = 0
    alarms = []
    first = None
    for i in range(k, len(xs)):
        m += 1000 * xs[i] - mu0 - delta
        mmin = min(mmin, m)
        # the engine's running min starts at the first monitored m
        gap = m - min(
            [
                sum(
                    1000 * xs[j] - mu0 - delta
                    for j in range(k, jj + 1)
                )
                for jj in range(k, i + 1)
            ]
        )
        max_gap = max(max_gap, gap)
        if gap > lam:
            alarms.append(i)
            if first is None:
                first = i
    return {
        "n": len(xs),
        "k": k,
        "mu0_milli": mu0,
        "max_gap": max_gap,
        "n_alarms": len(alarms),
        "first_alarm_t": first,
    }


def _run_ewma(spark, xs, k):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return ewma_chart(df, baseline_k=k).collect()[0].asDict()


def _run_ph(spark, xs, k):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return page_hinkley(df, baseline_k=k).collect()[0].asDict()


STABLE = [20 + (i * 7) % 5 for i in range(80)]
SHIFT = STABLE[:50] + [28 + (i * 7) % 5 for i in range(50, 80)]


def test_ewma_matches_replay(spark):
    for xs in (STABLE, SHIFT):
        assert _run_ewma(spark, xs, 20) == py_ewma(xs, 20)


def test_ewma_silent_then_alarms_after_onset(spark):
    quiet = _run_ewma(spark, STABLE, 20)
    loud = _run_ewma(spark, SHIFT, 20)
    assert quiet["n_alarms"] == 0 and quiet["first_alarm_t"] is None
    assert loud["n_alarms"] > 0
    assert loud["first_alarm_t"] >= 50  # never before the shift


def test_ewma_zero_variance_null(spark):
    xs = [5] * 20 + [9] * 10
    got = _run_ewma(spark, xs, 20)
    assert got["n_alarms"] is None


def test_ph_matches_replay(spark):
    for xs in (STABLE, SHIFT):
        assert _run_ph(spark, xs, 20) == py_ph(xs, 20)


def test_ph_silent_and_alarm_lanes(spark):
    quiet = _run_ph(spark, STABLE, 20)
    loud = _run_ph(spark, SHIFT, 20)
    assert quiet["n_alarms"] == 0
    assert loud["n_alarms"] > 0 and loud["first_alarm_t"] >= 50


def test_ph_sub_delta_drift_silent(spark):
    # +0.4/1000 per-step mean excess < delta = 0.5: never accumulates
    xs = [20] * 20 + [20 + (1 if i % 5 == 0 else 0) for i in range(100)]
    got = _run_ph(spark, xs, 20)
    assert got == py_ph(xs, 20)
    assert got["n_alarms"] == 0


def test_ph_nothing_to_monitor(spark):
    got = _run_ph(spark, [7, 8, 9], 20)
    # fewer rows than the baseline: the monitored set is empty
    assert got["n_alarms"] is None or got["n_alarms"] == 0
