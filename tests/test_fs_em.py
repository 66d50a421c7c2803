"""Fellegi-Sunter EM (link/fellegi.py fs_em) gates: bit-exact Python
replay of the integer ppm EM rounds, planted-parameter recovery on a
4000-pair mixture, and the degenerate-denominator guard (all-zero
responsibilities keep the previous parameters instead of div0)."""

from __future__ import annotations

import hashlib

from spanluke_spark.link.fellegi import EM_SCALE, fs_em

PLANTED_M = (900, 800, 700)   # per-field P(agree | match), /1000
PLANTED_U = (200, 300, 100)   # per-field P(agree | non-match)
N_PAIRS = 4000


def h1000(i: int, salt: str) -> int:
    return int(hashlib.md5(f"{i}|{salt}".encode()).hexdigest()[:15], 16) % 1000


def planted_pairs():
    rows = []
    for i in range(N_PAIRS):
        is_match = (i * 2654435761) % 10 < 3
        g = tuple(
            1 if h1000(i, f"f{k}") < (PLANTED_M if is_match else PLANTED_U)[k] else 0
            for k in range(3)
        )
        rows.append((i, *g))
    return rows


def py_em(counts, K, rounds, init_p, init_m, init_u):
    S = EM_SCALE
    clamp = lambda x: min(max(x, 1), S - 1)
    p = init_p
    m = [init_m] * K
    u = [init_u] * K
    for _ in range(rounds):
        sw = swc = 0
        sn = 0
        swg = [0] * K
        swcg = [0] * K
        nw_total = 0
        for g, n in counts.items():
            pm = pu = S
            for k in range(K):
                tm = m[k] if g[k] else S - m[k]
                tu = u[k] if g[k] else S - u[k]
                pm = pm * tm // S
                pu = pu * tu // S
            wnum = p * pm // S
            wden = wnum + (S - p) * pu // S
            w = 0 if wden == 0 else wnum * S // wden
            sw += n * w
            swc += n * (S - w)
            sn += n
            nw_total += n * w
            for k in range(K):
                swg[k] += n * w * g[k]
                swcg[k] += n * (S - w) * g[k]
        p = clamp(nw_total // sn)
        m = [m[k] if sw == 0 else clamp(swg[k] * S // sw) for k in range(K)]
        u = [u[k] if swc == 0 else clamp(swcg[k] * S // swc) for k in range(K)]
    return p, m, u


def pattern_counts():
    counts = {}
    for _, a, b, c in planted_pairs():
        counts[(a, b, c)] = counts.get((a, b, c), 0) + 1
    return counts


def test_em_matches_python_integer_replay(spark):
    df = spark.createDataFrame(planted_pairs(), "i long, f0 int, f1 int, f2 int")
    got = {r["field"]: r for r in fs_em(df, ["f0", "f1", "f2"], rounds=4).collect()}
    p, m, u = py_em(pattern_counts(), 3, 4, 500_000, 900_000, 100_000)
    for k in range(3):
        r = got[f"f{k}"]
        assert r["m_ppm"] == m[k], (k, r["m_ppm"], m[k])
        assert r["u_ppm"] == u[k]
        assert r["p_ppm"] == p
        assert r["n_pairs"] == N_PAIRS


def test_em_recovers_planted_parameters(spark):
    df = spark.createDataFrame(planted_pairs(), "i long, f0 int, f1 int, f2 int")
    got = {r["field"]: r for r in fs_em(df, ["f0", "f1", "f2"], rounds=8).collect()}
    for k in range(3):
        r = got[f"f{k}"]
        assert abs(r["m_ppm"] / EM_SCALE - PLANTED_M[k] / 1000) < 0.08, (k, r["m_ppm"])
        assert abs(r["u_ppm"] / EM_SCALE - PLANTED_U[k] / 1000) < 0.08, (k, r["u_ppm"])
    assert abs(got["f0"]["p_ppm"] / EM_SCALE - 0.3) < 0.08


def test_degenerate_p_keeps_m_via_guard(spark):
    # init_p = 0 (clamped arithmetic still yields w = 0 everywhere):
    # sw = 0, so m must stay at its init instead of dividing by zero
    df = spark.createDataFrame(planted_pairs()[:200], "i long, f0 int, f1 int, f2 int")
    got = {r["field"]: r for r in fs_em(df, ["f0", "f1", "f2"], rounds=2, init_p=0).collect()}
    for k in range(3):
        assert got[f"f{k}"]["m_ppm"] == 900_000
