"""Gates for textops/hellinger.py and evaluation/stuartmaxwell.py:
Bhattacharyya/Hellinger — identical-corpora (total 1000) EXACT
1e6/0, disjoint EXACT 0/1e6 with NULL bd, swap symmetry, the
bc + h2 == 1e6 complement-by-construction, bit-exact python replay
of the floor(ieee_sqrt(div)) cells, float cross-check, bad-counts
audit; Stuart-Maxwell — closed form == numpy matrix form (Maxwell
1970 identity), symmetric-table EXACT zero while flows are huge,
diagonal-only no_discordance, single-pair singular lane, planted
1->2 relabel drift fires, out-of-regime audit."""

from __future__ import annotations

import math

from spanluke_spark.evaluation.stuartmaxwell import stuart_maxwell
from spanluke_spark.textops.hellinger import bhattacharyya_hellinger

# ---------------------------------------------------- python replays


def py_bh(cells):
    """cells: {term: (a, b)}. Bit-exact replay of the engine cells."""
    a_tot = sum(a for a, _ in cells.values())
    b_tot = sum(b for _, b in cells.values())
    bc = 0
    for a, b in cells.values():
        q = (a * b * 10**12) // (a_tot * b_tot)
        bc += math.floor(math.sqrt(q))
    return bc, a_tot, b_tot


def py_sm(pairs):
    """Closed-form chi2_milli replay + float matrix form."""
    import numpy as np

    n = [[0] * 3 for _ in range(3)]
    for a, b in pairs:
        n[a][b] += 1
    row = [sum(n[i]) for i in range(3)]
    col = [sum(n[j][i] for j in range(3)) for i in range(3)]
    d = [row[i] - col[i] for i in range(3)]
    m = {
        (i, j): n[i][j] + n[j][i]
        for i in range(3)
        for j in range(3)
        if i < j
    }
    num = (
        m[(1, 2)] * d[0] ** 2
        + m[(0, 2)] * d[1] ** 2
        + m[(0, 1)] * d[2] ** 2
    )
    den = (
        m[(0, 1)] * m[(0, 2)]
        + m[(0, 1)] * m[(1, 2)]
        + m[(0, 2)] * m[(1, 2)]
    )
    s_mat = np.array(
        [
            [row[0] + col[0] - 2 * n[0][0], -(n[0][1] + n[1][0])],
            [-(n[0][1] + n[1][0]), row[1] + col[1] - 2 * n[1][1]],
        ],
        dtype=float,
    )
    dv = np.array(d[:2], dtype=float)
    chi2_matrix = float(dv @ np.linalg.solve(s_mat, dv))
    return num * 1000 // den if den else None, chi2_matrix


def _mk_bh(spark, cells):
    rows = []
    for t, (a, b) in cells.items():
        if a:
            rows.append((0, t, a))
        if b:
            rows.append((1, t, b))
    return spark.createDataFrame(rows, "src long, term string, c long")


def _mk_sm(spark, pairs):
    return spark.createDataFrame(pairs, "cat_a long, cat_b long")


# ---------------------------------------- bhattacharyya / hellinger


def test_bh_identical_total_1000_exact(spark):
    cells = {f"t{i}": (c, c) for i, c in enumerate((500, 300, 150, 50))}
    got = bhattacharyya_hellinger(_mk_bh(spark, cells)).collect()[0]
    assert got.status == "ok"
    assert got.bc_ppm == 1000000
    assert got.h2_ppm == 0
    assert got.bd_micro == 0


def test_bh_disjoint_exact(spark):
    cells = {"x": (7, 0), "y": (3, 0), "u": (0, 9), "v": (0, 11)}
    got = bhattacharyya_hellinger(_mk_bh(spark, cells)).collect()[0]
    assert got.bc_ppm == 0
    assert got.h2_ppm == 1000000
    assert got.bd_micro is None
    assert got.status == "ok"


def test_bh_replay_and_complement(spark):
    cells = {
        f"w{i}": ((i * 17 + 3) % 23 + 1, (i * 11 + 5) % 19 + 1)
        for i in range(40)
    }
    bc, a_tot, b_tot = py_bh(cells)
    got = bhattacharyya_hellinger(_mk_bh(spark, cells)).collect()[0]
    assert (got.a_tot, got.b_tot) == (a_tot, b_tot)
    assert got.bc_ppm == bc
    assert got.bc_ppm + got.h2_ppm == 1000000
    # float cross-check: true BC within 50 ppm + n_types floor bias
    true_bc = sum(
        math.sqrt((a / a_tot) * (b / b_tot))
        for a, b in cells.values()
    )
    assert 0 <= true_bc * 1e6 - got.bc_ppm <= len(cells) + 50


def test_bh_swap_symmetric(spark):
    cells = {"a": (5, 9), "b": (11, 2), "c": (0, 4), "d": (6, 0)}
    flipped = {t: (b, a) for t, (a, b) in cells.items()}
    g1 = bhattacharyya_hellinger(_mk_bh(spark, cells)).collect()[0]
    g2 = bhattacharyya_hellinger(_mk_bh(spark, flipped)).collect()[0]
    assert g1.bc_ppm == g2.bc_ppm
    assert g1.h2_ppm == g2.h2_ppm


def test_bh_bad_counts_audit(spark):
    df = _mk_bh(spark, {"a": (5, 3)}).union(
        _mk_bh(spark, {"z": (1, 1)}).selectExpr(
            "src", "term", "-2 as c"
        )
    )
    got = bhattacharyya_hellinger(df).collect()[0]
    assert got.status == "bad_counts"
    assert got.bc_ppm is None


# ------------------------------------------------- stuart - maxwell


def test_sm_closed_form_equals_matrix_form(spark):
    pairs = (
        [(0, 0)] * 20
        + [(0, 1)] * 7
        + [(1, 0)] * 2
        + [(1, 1)] * 15
        + [(1, 2)] * 6
        + [(2, 1)] * 3
        + [(2, 2)] * 12
        + [(0, 2)] * 4
        + [(2, 0)] * 1
    )
    want_milli, want_float = py_sm(pairs)
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "ok"
    assert got.chi2_milli == want_milli
    assert abs(got.chi2_milli / 1000 - want_float) < 2e-3


def test_sm_symmetric_flows_exact_zero(spark):
    # huge symmetric churn: margins identical -> chi2 EXACTLY 0
    pairs = (
        [(0, 1)] * 50
        + [(1, 0)] * 50
        + [(1, 2)] * 30
        + [(2, 1)] * 30
        + [(0, 2)] * 20
        + [(2, 0)] * 20
    )
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "ok"
    assert (got.d1, got.d2, got.d3) == (0, 0, 0)
    assert got.chi2_milli == 0
    assert got.sig05 is False


def test_sm_planted_relabel_drift_fires(spark):
    pairs = (
        [(i % 3, i % 3) for i in range(60)]
        + [(1, 2)] * 15
        + [(0, 1)] * 5
        + [(1, 0)] * 5
    )
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is True


def test_sm_diagonal_only_no_discordance(spark):
    pairs = [(i % 3, i % 3) for i in range(30)]
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "no_discordance"
    assert got.chi2_milli is None


def test_sm_single_pair_singular(spark):
    pairs = [(0, 0)] * 5 + [(1, 2)] * 4 + [(2, 2)] * 3
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "singular"
    assert got.chi2_milli is None


def test_sm_out_of_regime(spark):
    pairs = [(0, 1), (1, 1), (3, 0)]
    got = stuart_maxwell(_mk_sm(spark, pairs)).collect()[0]
    assert got.status == "out_of_regime"
    assert got.chi2_milli is None
