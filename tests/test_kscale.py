"""Gates for evaluation/kscale.py: Conover squared-rank k-group
scale test — bit-exact python replay of the quantized cells,
identical-groups EXACT-zero (k=5, n=8; 8 | 1000*T^2 and 40 | 1000*S^2
divisibility stated), planted wide group fires while Kruskal-Wallis
location stays quiet, all-constant degenerate; Dunn's pairwise —
bit-exact replay with tie correction, identical-groups all-zero,
single-shifted-group fires exactly its own pairs, the Bonferroni
constant table recomputed from statistics.NormalDist (rot gate),
float cross-check of z^2."""

from __future__ import annotations

from statistics import NormalDist

from spanluke_spark.evaluation.kscale import (
    _BONF_MILLI,
    conover_scale,
    dunn_pairs,
)

# ---------------------------------------------------- python replays


def _midranks2(vals):
    """value -> doubled midrank over the multiset."""
    out = {}
    seen = 0
    for v in sorted(set(vals)):
        c = vals.count(v)
        out[v] = 2 * seen + c + 1
        seen += c
    return out


def py_conover(rows):
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, x in rows:
        by_g[g].append(x)
    cent = []
    for g, v in by_g.items():
        sv = sorted(v)
        n = len(sv)
        dmed = sv[(n + 1) // 2 - 1] + sv[(n + 2) // 2 - 1]
        cent += [(g, abs(2 * x - dmed)) for x in v]
    vals = [d for _, d in cent]
    mr = _midranks2(vals)
    s = {g_d: mr[g_d[1]] ** 2 for g_d in set(cent)}
    rows_s = [(g, mr[d] ** 2) for g, d in cent]
    nn = len(rows_s)
    t = defaultdict(int)
    for g, sc in rows_s:
        t[g] += sc
    s_all = sum(sc for _, sc in rows_s)
    q_all = sum(sc * sc for _, sc in rows_s)
    ng = {g: len(v) for g, v in by_g.items()}
    cell_sum = sum(t[g] ** 2 * 1000 // ng[g] for g in by_g)
    a_milli = cell_sum - s_all**2 * 1000 // nn
    den = nn * q_all - s_all**2
    sign = 1 if a_milli >= 0 else -1
    chi2 = sign * ((nn - 1) * abs(a_milli) * nn // den) if den else None
    return a_milli, chi2


def py_dunn(rows):
    from collections import defaultdict

    vals = [x for _, x in rows]
    mr = _midranks2(vals)
    u = defaultdict(int)
    ng = defaultdict(int)
    for g, x in rows:
        u[g] += mr[x]
        ng[g] += 1
    nn = len(rows)
    tt = sum(
        vals.count(v) ** 3 - vals.count(v) for v in set(vals)
    )
    out = {}
    for ga in sorted(u):
        for gb in sorted(u):
            if ga < gb:
                num = (
                    3
                    * (nn - 1)
                    * (ng[gb] * u[ga] - ng[ga] * u[gb]) ** 2
                    * 1000
                )
                den = (
                    ng[ga]
                    * ng[gb]
                    * (ng[ga] + ng[gb])
                    * (nn * (nn + 1) * (nn - 1) - tt)
                )
                out[(ga, gb)] = num // den
    return out


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp long, x long")


# ----------------------------------------------------------- conover


def test_conover_identical_groups_exact_zero(spark):
    vals = [1, 2, 4, 4, 7, 9, 13, 20]  # n = 8 per group, k = 5
    rows = [(g, v) for g in range(5) for v in vals]
    got = conover_scale(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.a_milli == 0
    assert got.chi2_milli == 0
    assert got.sig05 is False


def test_conover_replay_random(spark):
    rows = [
        (i % 3, ((i * 23 + 5) % 31) * (1 + (i % 3 == 1)))
        for i in range(36)
    ]
    a_milli, chi2 = py_conover(rows)
    got = conover_scale(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.a_milli == a_milli
    assert got.chi2_milli == chi2


def test_conover_wide_group_fires_kw_quiet(spark):
    # group 1 is 15x wider around the SAME median; Conover fires,
    # Kruskal-Wallis (location) stays quiet.
    from spanluke_spark.evaluation.kruskal import kruskal_wallis

    g0 = [(0, v) for v in (-2, -1, 0, 1, 2) for _ in range(5)]
    g1 = [(1, v) for v in (-30, -15, 0, 15, 30) for _ in range(5)]
    df = _mk(spark, g0 + g1)
    got = conover_scale(df).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is True
    kw = kruskal_wallis(
        df.selectExpr("grp", "x as value"), crit_ppm=3841459
    ).collect()[0]
    assert not kw.sig


def test_conover_all_constant_degenerate(spark):
    rows = [(g, 4) for g in (0, 1) for _ in range(6)]
    got = conover_scale(_mk(spark, rows)).collect()[0]
    assert got.status == "degenerate"
    assert got.chi2_milli is None


# -------------------------------------------------------------- dunn


def test_dunn_bonferroni_table_rot_gate():
    nd = NormalDist()
    for m, want in _BONF_MILLI.items():
        z = nd.inv_cdf(1 - 0.025 / m)
        assert round(z * z * 1000) == want


def test_dunn_replay_with_ties(spark):
    rows = [
        (i % 4, ((i * 17 + 3) % 13) + 2 * (i % 4)) for i in range(40)
    ]
    want = py_dunn(rows)
    got = dunn_pairs(_mk(spark, rows)).collect()
    assert len(got) == 6
    for r in got:
        assert r.status == "ok"
        assert r.z2_milli == want[(r.g_a, r.g_b)]
        assert r.m_pairs == 6
        assert r.crit_milli == _BONF_MILLI[6]


def test_dunn_identical_groups_all_zero(spark):
    vals = [3, 5, 5, 8, 11]
    rows = [(g, v) for g in range(3) for v in vals]
    got = dunn_pairs(_mk(spark, rows)).collect()
    assert len(got) == 3
    assert all(r.z2_milli == 0 for r in got)
    assert all(r.sig_bonf05 is False for r in got)


def test_dunn_shifted_group_fires_its_pairs_only(spark):
    rows = (
        [(0, v) for v in range(20)]
        + [(1, v) for v in range(20)]
        + [(2, v + 200) for v in range(20)]
    )
    got = {
        (r.g_a, r.g_b): r for r in dunn_pairs(_mk(spark, rows)).collect()
    }
    assert got[(0, 1)].sig_bonf05 is False
    assert got[(0, 2)].sig_bonf05 is True
    assert got[(1, 2)].sig_bonf05 is True


def test_dunn_all_tied_degenerate(spark):
    rows = [(g, 9) for g in (0, 1, 2) for _ in range(4)]
    got = dunn_pairs(_mk(spark, rows)).collect()
    assert all(r.status == "degenerate" for r in got)
    assert all(r.z2_milli is None for r in got)
