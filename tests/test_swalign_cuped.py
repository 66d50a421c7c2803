"""Gates for Smith-Waterman local alignment (textops/swalign.py) and
CUPED variance reduction (evaluation/cuped.py): SW against a textbook
O(H*R) Python DP replay (bit-exact scores), the embedded-quote
closed form (clean k-token quote in unrelated context scores exactly
2k), locality (prefix/suffix junk cannot lower the score — the
property global WER lacks), identity/disjoint/empty edges; CUPED
against an exact staged-integer replay, the Y == X algebraic-zero
lane, theta == 1000 / var_red == 1e6 exactness, the planted
selection-bias story (raw reads bias + effect, adjusted recovers the
effect), and the constant-covariate NULL contract."""

from __future__ import annotations

from spanluke_spark.evaluation.cuped import cuped
from spanluke_spark.textops.swalign import smith_waterman

# ------------------------------------------------------- smith-waterman


def py_sw(hyp, ref):
    """Textbook Smith-Waterman, MATCH 2 / MISMATCH -1 / GAP -1."""
    best = 0
    prev = [0] * (len(ref) + 1)
    for c in hyp:
        cur = [0] * (len(ref) + 1)
        for j in range(1, len(ref) + 1):
            s = 2 if ref[j - 1] == c else -1
            cur[j] = max(0, prev[j - 1] + s, prev[j] - 1, cur[j - 1] - 1)
            best = max(best, cur[j])
        prev = cur
    return best


def _run_sw(spark, rows):
    df = spark.createDataFrame(
        rows, "pair_id long, hyp array<string>, ref array<string>"
    )
    return {
        r["pair_id"]: (r["score"], r["sw_ppm"])
        for r in smith_waterman(df).collect()
    }


def words(seed, n, vocab=7):
    return [f"w{(seed * 13 + i * 5 + i * i) % vocab}" for i in range(n)]


def test_sw_matches_textbook_dp(spark):
    rows = [
        (i, words(i, 8 + i % 5), words(i + 3, 10 + i % 4)) for i in range(40)
    ]
    got = _run_sw(spark, rows)
    for pid, hyp, ref in rows:
        assert got[pid][0] == py_sw(hyp, ref), pid


def test_sw_embedded_quote_scores_2k_and_is_local(spark):
    """A clean 6-token quote inside unrelated junk scores exactly 12,
    and adding MORE junk around it cannot lower the score."""
    quote = [f"q{i}" for i in range(6)]
    hyp = ["x1", "x2"] + quote + ["x3"]
    ref = ["y1"] + quote + ["y2", "y3", "y4"]
    got = _run_sw(spark, [(0, hyp, ref)])
    assert got[0][0] == 12
    bigger = _run_sw(
        spark, [(0, ["z%d" % i for i in range(5)] + hyp, ref + ["k1", "k2"])]
    )
    assert bigger[0][0] >= 12


def test_sw_identity_disjoint_empty(spark):
    same = [f"a{i}" for i in range(9)]
    got = _run_sw(
        spark,
        [
            (0, same, same),
            (1, ["a", "b"], ["c", "d"]),
            (2, [], ["a", "b"]),
        ],
    )
    assert got[0] == (18, 1_000_000)  # perfect: 2 * min(9, 9)
    assert got[1] == (0, 0)
    assert got[2] == (0, None)


# ---------------------------------------------------------------- cuped


def tz(a, b):
    return -(abs(a) // b) if a < 0 else a // b


def py_cuped(rows):
    n = len(rows)
    sx = sum(x for _, x, _ in rows)
    sy = sum(y for _, _, y in rows)
    sxx = n * sum(x * x for _, x, _ in rows) - sx * sx
    sxy = n * sum(x * y for _, x, y in rows) - sx * sy
    syy = n * sum(y * y for _, _, y in rows) - sy * sy
    n_t = sum(1 for t, _, _ in rows if t)
    n_c = n - n_t
    sxt = sum(x for t, x, _ in rows if t)
    syt = sum(y for t, _, y in rows if t)
    sxc, syc = sx - sxt, sy - syt
    rawnum = syt * n_c - syc * n_t
    adjnum = rawnum * sxx - sxy * (sxt * n_c - sxc * n_t)
    out = {"n_t": n_t, "n_c": n_c, "sxx": sxx, "sxy": sxy, "syy": syy}
    out["theta_milli"] = tz(sxy * 1000, sxx) if sxx > 0 else None
    out["var_red_ppm"] = (
        (sxy * sxy // sxx) * 1_000_000 // syy
        if sxx > 0 and syy > 0
        else None
    )
    out["diff_raw_milli"] = tz(rawnum * 1000, n_t * n_c)
    out["diff_adj_milli"] = (
        tz(tz(adjnum, n_t * n_c) * 1000, sxx) if sxx > 0 else None
    )
    return out


def _run_cuped(spark, rows):
    df = spark.createDataFrame(rows, "treat boolean, x long, y long")
    return cuped(df).collect()[0].asDict()


def test_cuped_matches_staged_replay(spark):
    rows = [
        (i % 2 == 1, (i * 7) % 50 + (i % 2) * 6,
         (i * 7) % 50 + (i % 2) * 15 + (i * 13) % 5)
        for i in range(200)
    ]
    assert _run_cuped(spark, rows) == py_cuped(rows)


def test_cuped_y_equals_x_is_algebraic_zero(spark):
    rows = [(i % 2 == 0, (i * 11) % 40 + (i % 2) * 3,
             (i * 11) % 40 + (i % 2) * 3) for i in range(120)]
    got = _run_cuped(spark, rows)
    assert got["theta_milli"] == 1000
    assert got["var_red_ppm"] == 1_000_000
    assert got["diff_adj_milli"] == 0  # numerator cancels exactly
    assert got["diff_raw_milli"] != 0  # the bias CUPED removes


def test_cuped_removes_planted_selection_bias(spark):
    """x biased +6 in treatment, true effect +9 (plus value noise):
    raw reads ~15, adjusted recovers ~9."""
    rows = [
        (i % 2 == 1, (i * 7) % 50 + (i % 2) * 6,
         (i * 7) % 50 + (i % 2) * 6 + (i % 2) * 9 + (i * 13) % 5)
        for i in range(400)
    ]
    got = _run_cuped(spark, rows)
    raw, adj = got["diff_raw_milli"], got["diff_adj_milli"]
    # the parity-correlated noise term adds ~+1 on top of 6 + 9
    assert raw == 16_000
    assert abs(adj - 9_000) < 1_000
    assert abs(adj - 9_000) < abs(raw - 9_000)


def test_cuped_constant_covariate_is_null(spark):
    rows = [(i % 2 == 0, 5, (i * 3) % 20) for i in range(80)]
    got = _run_cuped(spark, rows)
    assert got["sxx"] == 0
    assert got["theta_milli"] is None
    assert got["var_red_ppm"] is None
    assert got["diff_adj_milli"] is None
    assert got["diff_raw_milli"] is not None
