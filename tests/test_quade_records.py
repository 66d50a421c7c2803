"""Gates for evaluation/quade.py: Quade against an exact replay AND
the float Conover T3, the spread-weighting property (an effect
living in the wide blocks fires Quade harder than Friedman's flat
view would suggest via the weighted sums), perfect-consistency and
incomplete statuses; records test against a floor-cell replay, the
monotone R == n firing from above, reversed R == 1 from below,
scramble quiet, tie-does-not-set-record, and n < 2 NULL."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.evaluation.quade import quade_test, records_test

# ---------------------------------------------------- python replays


def _drs(values):
    out = {}
    for v in set(values):
        less = sum(1 for u in values if u < v)
        eq = sum(1 for u in values if u == v)
        out[v] = 2 * less + eq + 1
    return out


def py_quade(rows):
    blocks = defaultdict(dict)
    for blk, trt, y in rows:
        blocks[blk][trt] = y
    b = len(blocks)
    ks = {len(v) for v in blocks.values()}
    kmin, kmax = min(ks), max(ks)
    ranges = {blk: max(v.values()) - min(v.values())
              for blk, v in blocks.items()}
    qd = _drs(list(ranges.values()))
    cells = defaultdict(list)
    for blk, v in blocks.items():
        dr = _drs(list(v.values()))
        for trt, y in v.items():
            cells[trt].append(qd[ranges[blk]] * (dr[y] - (kmin + 1)))
    a_sum = sum(c * c for v in cells.values() for c in v)
    b_raw = sum(sum(v) ** 2 for v in cells.values())
    den = b * a_sum - b_raw
    out = {"b": b, "k": kmin, "a_sum": a_sum, "b_sum": b_raw,
           "df1": kmin - 1, "df2": (b - 1) * (kmin - 1)}
    if kmin != kmax:
        out.update(t3_milli=None, status="incomplete")
    elif den == 0:
        out.update(t3_milli=None, status="perfect_consistency")
    else:
        out.update(
            t3_milli=1000 * (b - 1) * b_raw // den, status="ok"
        )
    return out


def py_records(xs):
    n = len(xs)
    r = 0
    mx = None
    for v in xs:
        if mx is None or v > mx:
            r += 1
            mx = v
    e = sum(10**6 // j for j in range(1, n + 1))
    var = sum(10**6 // j - 10**6 // (j * j) for j in range(1, n + 1))
    dev = 10**6 * r - e
    out = {"n": n, "n_records": r, "e_micro": e, "v_micro": var}
    if n >= 2 and var > 0:
        z2 = 1000 * dev * dev // (10**6 * var)
        out["z2_milli"] = z2
        out["sig05"] = z2 > 3841
    else:
        out["z2_milli"] = None
        out["sig05"] = None
    out["direction"] = (
        "record_rich" if dev > 0 else "record_poor" if dev < 0
        else "as_expected"
    )
    return out


def _run_quade(spark, rows):
    df = spark.createDataFrame(
        list(rows), "block long, treatment string, y long"
    )
    return quade_test(df).collect()[0].asDict()


def _run_records(spark, xs):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return records_test(df).collect()[0].asDict()


def _design():
    rows = []
    for blk in range(8):
        spread = 1 + (blk % 4) * 5
        for ti, trt in enumerate("abc"):
            y = 10 + blk + ti * spread + (blk * 7 + ti * 3) % 2
            rows.append((blk, trt, y))
    return rows


def test_quade_matches_replay_and_float(spark):
    rows = _design()
    got = _run_quade(spark, rows)
    assert got == py_quade(rows)
    exp = py_quade(rows)
    t3_f = (exp["b"] - 1) * exp["b_sum"] / (
        exp["b"] * exp["a_sum"] - exp["b_sum"]
    )
    assert abs(got["t3_milli"] - t3_f * 1000) <= 1


def test_quade_effect_fires(spark):
    got = _run_quade(spark, _design())
    assert got["t3_milli"] > 3000  # consistent treatment ordering
    assert got["status"] == "ok"


def test_quade_perfect_consistency(spark):
    rows = [(blk, t, 10 * "abc".index(t) + blk) for blk in range(5)
            for t in "abc"]
    got = _run_quade(spark, rows)
    assert got["status"] == "perfect_consistency"
    assert got["t3_milli"] is None


def test_quade_incomplete(spark):
    rows = _design()[:-1]
    got = _run_quade(spark, rows)
    assert got["status"] == "incomplete"


def test_records_replay_and_lanes(spark):
    scramble = [(i * i * 31 + i * 17) % 23 for i in range(40)]
    got = _run_records(spark, scramble)
    assert got == py_records(scramble)
    assert got["sig05"] is False
    up = _run_records(spark, list(range(40)))
    assert up["n_records"] == 40 and up["sig05"] is True
    assert up["direction"] == "record_rich"
    down = _run_records(spark, list(range(40, 0, -1)))
    assert down["n_records"] == 1
    assert down["direction"] == "record_poor"
    assert down == py_records(list(range(40, 0, -1)))


def test_records_tie_does_not_set(spark):
    got = _run_records(spark, [5, 5, 5, 7, 7])
    assert got["n_records"] == 2  # the first 5 and the first 7
    assert got == py_records([5, 5, 5, 7, 7])


def test_records_tiny_null(spark):
    got = _run_records(spark, [3])
    assert got["z2_milli"] is None
