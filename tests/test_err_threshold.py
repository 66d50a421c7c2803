"""Gates for ERR@k (evaluation/ranking.py) and the threshold sweep
(evaluation/threshold.py): ERR against a bit-exact sequential-product
replay AND a float cascade-model cross-check, the rank-1 grade-3
875e6 closed form, all-zero zero, rank-1 dominance (a grade-3 at rank
1 beats ANY list with grade <= 2 at rank 1), prefix monotonicity;
sweep against a replay, perfect-separation exact lanes, TP/FP
monotonicity, the all-in J == 0 identity and the best-row pin."""

from __future__ import annotations

from spanluke_spark.evaluation.ranking import err_at_k
from spanluke_spark.evaluation.threshold import threshold_sweep

# ---------------------------------------------------- python replays


def py_err(grades):
    """grades = list by rank 1..len; returns (n, err_ppb)."""
    p = 1
    err = 0
    for i, g in enumerate(grades):
        r = i + 1
        num = (1 << g) - 1
        err += 10**9 * num * p // (r * (1 << (3 * r)))
        p *= 8 - num
    return {"n_ranked": len(grades), "err_ppb": err}


def float_err(grades):
    pf, err = 1.0, 0.0
    for i, g in enumerate(grades):
        rr = ((1 << g) - 1) / 8
        err += rr * pf / (i + 1)
        pf *= 1 - rr
    return err


def py_sweep(rows):
    per = {}
    for s, y in rows:
        c, p = per.get(s, (0, 0))
        per[s] = (c + 1, p + (1 if y else 0))
    p_tot = sum(p for _, p in per.values())
    n_tot = sum(c - p for c, p in per.values())
    tp = fp = 0
    out = []
    for t in sorted(per, reverse=True):
        c, p = per[t]
        tp += p
        fp += c - p
        f1 = 2 * tp * 10**6 // (2 * tp + fp + (p_tot - tp))
        j = (
            tp * 1000 // p_tot - fp * 1000 // n_tot
            if p_tot > 0 and n_tot > 0
            else None
        )
        out.append({"t": t, "tp": tp, "fp": fp,
                    "f1_ppm": f1, "j_milli": j})
    best = max(out, key=lambda r: (r["f1_ppm"], -r["t"]))
    for r in out:
        r["is_best_f1"] = r is best
    return sorted(out, key=lambda r: r["t"])


def _run_err(spark, lists):
    rows = [
        (q, i + 1, g)
        for q, grades in lists.items()
        for i, g in enumerate(grades)
    ]
    df = spark.createDataFrame(
        rows, "query_id long, rank long, grade long"
    )
    got = err_at_k(df, k=10).orderBy("query_id").collect()
    return {r["query_id"]: r.asDict() for r in got}


def _run_sweep(spark, rows):
    df = spark.createDataFrame(rows, "score long, label boolean")
    return [r.asDict() for r in threshold_sweep(df).orderBy("t").collect()]


# ----------------------------------------------------------------- err


def test_err_matches_replay_and_float(spark):
    lists = {
        q: [((q * 13 + (r + 1) * 7) % 4) for r in range(10)]
        for q in range(1, 9)
    }
    got = _run_err(spark, lists)
    for q, grades in lists.items():
        exp = py_err(grades)
        assert got[q]["n_ranked"] == exp["n_ranked"]
        assert got[q]["err_ppb"] == exp["err_ppb"]
        assert abs(got[q]["err_ppb"] - float_err(grades) * 1e9) <= 10


def test_err_rank1_grade3_closed_form(spark):
    got = _run_err(spark, {1: [3]})
    assert got[1]["err_ppb"] == 875_000_000  # (2^3-1)/2^3 * 1e9


def test_err_all_zero(spark):
    got = _run_err(spark, {1: [0] * 10})
    assert got[1]["err_ppb"] == 0


def test_err_rank1_dominance(spark):
    """Cascade property: grade 3 at rank 1 (ERR >= 0.875) beats any
    list whose rank-1 grade is <= 2 (ERR <= 3/8 + 5/8 = 1 - 5/8/2...
    bounded by R1 + (1-R1) * 1 * sum 1/r ... checked concretely)."""
    best = _run_err(spark, {1: [3] + [0] * 9})
    for top in (0, 1, 2):
        other = _run_err(spark, {1: [top] + [3] * 9})
        assert best[1]["err_ppb"] > other[1]["err_ppb"]


def test_err_prefix_monotone(spark):
    """Appending ranks never decreases ERR."""
    grades = [1, 3, 0, 2, 1, 3, 0, 0, 2, 1]
    prev = -1
    for k in range(1, 11):
        cur = py_err(grades[:k])["err_ppb"]
        assert cur >= prev
        prev = cur
    got = _run_err(spark, {1: grades})
    assert got[1]["err_ppb"] == prev


# --------------------------------------------------------------- sweep


def test_sweep_matches_replay(spark):
    rows = [((e * 13) % 100, (e * 13) % 100 + (e * 11) % 30 > 60)
            for e in range(400)]
    assert _run_sweep(spark, rows) == py_sweep(rows)


def test_sweep_perfect_separation(spark):
    rows = [(s, False) for s in range(50)] + [
        (100 + s, True) for s in range(50)
    ]
    got = _run_sweep(spark, rows)
    best = [r for r in got if r["is_best_f1"]]
    assert len(best) == 1
    assert best[0]["t"] == 100
    assert best[0]["f1_ppm"] == 10**6 and best[0]["j_milli"] == 1000


def test_sweep_monotone_and_allin(spark):
    rows = [((e * 13) % 100, (e * 13) % 100 + (e * 11) % 30 > 60)
            for e in range(400)]
    got = _run_sweep(spark, rows)
    for a, b in zip(got, got[1:]):  # ascending t: tp/fp non-increasing
        assert b["tp"] <= a["tp"] and b["fp"] <= a["fp"]
    allin = got[0]  # lowest threshold admits everything
    p = sum(1 for _, y in rows if y)
    assert allin["tp"] == p and allin["j_milli"] == 0


def test_sweep_one_class_null_j(spark):
    rows = [((e * 7) % 20, True) for e in range(60)]
    got = _run_sweep(spark, rows)
    assert all(r["j_milli"] is None for r in got)
    assert all(r["f1_ppm"] is not None for r in got)
