"""Forecast backtest (etl/forecast.py) and dyad census
(graph/dyads.py) gates: bit-exact Python replay of all three
forecasters incl. the quantized EWMA weights and the two-stage MASE
trunc; a perfectly-seasonal series where seasonal-naive wins with
MASE 0; hand-built M-A-N census anchors, reciprocity extremes and the
self-loop drop."""

from __future__ import annotations

from spanluke_spark.etl.forecast import forecast_backtest
from spanluke_spark.graph.dyads import dyad_census


def py_backtest(series, n_buckets=168, season=24, horizon=24, lags=24):
    split = n_buckets - horizon
    out = {}
    for key, xs in series.items():
        train = {b: x for b, x in xs.items() if b < split}
        test = {b: x for b, x in xs.items() if b >= split}
        scale_terms = scale_num = 0
        for b, x in train.items():
            if b - season in train:
                scale_terms += 1
                scale_num += abs(x - train[b - season])
        lb = max(train)
        # naive
        fn, fd = train[lb], 1
        res = {}
        res["naive"] = (
            len(test),
            sum(abs(x * fd - fn) for x in test.values()),
            fd,
        )
        # seasonal naive (lag may resolve to any observed bucket)
        terms = [
            (b, x) for b, x in test.items() if b - season in xs
        ]
        res["seasonal_naive"] = (
            len(terms),
            sum(abs(x - xs[b - season]) for b, x in terms),
            1,
        )
        # ewma
        wnum = wden = 0
        for b, x in train.items():
            l = lb - b
            if l < lags:
                w = int(round(0.25 * 0.75**l * 1_000_000))
                wnum += w * x
                wden += w
        res["ewma"] = (
            len(test),
            sum(abs(x * wden - wnum) for x in test.values()),
            wden,
        )
        for m, (nt, err, fd) in res.items():
            mase = None
            if scale_num > 0 and nt > 0:
                mase = (err * 1_000_000 // (nt * fd)) * scale_terms // scale_num
            out[(key, m)] = (nt, err, nt * fd, scale_terms, scale_num, mase)
    return out


def fc_fixture():
    series = {}
    # noisy-trend series
    series["trend"] = {b: 50 + b // 4 + (b * 7) % 5 for b in range(168)}
    # perfectly seasonal with period 24
    series["seasonal"] = {b: 10 + (b % 24) * 3 for b in range(168)}
    # gappy series: every 3rd bucket missing
    series["gappy"] = {b: 20 + b % 7 for b in range(168) if b % 3}
    return series


def test_forecast_matches_python_replay(spark):
    series = fc_fixture()
    rows = [
        (k, b, x) for k, xs in series.items() for b, x in xs.items()
    ]
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    got = {
        (r["key"], r["method"]): r for r in forecast_backtest(df).collect()
    }
    want = py_backtest(series)
    assert set(got) == set(want)
    for k, (nt, err, mden, st, sn, mase) in want.items():
        r = got[k]
        assert (
            r["n_terms"],
            r["mae_num"],
            r["mae_den"],
            r["scale_terms"],
            r["scale_num"],
            r["mase_ppm"],
        ) == (nt, err, mden, st, sn, mase), k


def test_forecast_seasonal_series_prefers_seasonal_naive(spark):
    series = fc_fixture()
    rows = [
        (k, b, x) for k, xs in series.items() for b, x in xs.items()
    ]
    df = spark.createDataFrame(rows, "key string, bucket int, x long")
    got = {
        (r["key"], r["method"]): r for r in forecast_backtest(df).collect()
    }
    # perfectly periodic: seasonal-naive is exact -> MAE 0; the others not
    assert got[("seasonal", "seasonal_naive")]["mae_num"] == 0
    assert got[("seasonal", "naive")]["mae_num"] > 0
    assert got[("seasonal", "ewma")]["mae_num"] > 0


def test_dyad_census_anchors(spark):
    # a<->b mutual; a->c asym; d->e, e->d mutual; f isolated via g->f
    edges = [
        ("a", "b"), ("b", "a"), ("a", "c"),
        ("d", "e"), ("e", "d"), ("g", "f"),
        ("x", "x"),  # self loop must be dropped
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = dyad_census(df).collect()[0]
    assert (r["mutual"], r["asym"]) == (2, 2)
    assert r["n_nodes"] == 7 and r["n_edges"] == 6
    assert r["null_dyads"] == 7 * 6 // 2 - 4
    # reciprocity = 2*2 / (2*2 + 2) = 2/3
    assert r["reciprocity_ppm"] == 4 * 1_000_000 // 6


def test_dyad_census_extremes(spark):
    full = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    r = dyad_census(
        spark.createDataFrame(full, "src string, dst string")
    ).collect()[0]
    assert r["reciprocity_ppm"] == 1_000_000 and r["asym"] == 0
    oneway = [("a", "b"), ("b", "c"), ("c", "a")]
    r = dyad_census(
        spark.createDataFrame(oneway, "src string, dst string")
    ).collect()[0]
    assert r["reciprocity_ppm"] == 0 and r["mutual"] == 0
