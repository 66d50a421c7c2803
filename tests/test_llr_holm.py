"""Gates for Dunning LLR keywords (textops/llr.py) and Holm-Bonferroni
step-down (evaluation/holm.py): LLR against a bit-exact Python replay
of the ln-ppm quantization, a float G² cross-check, zero-cell and
balanced-token behavior; Holm against an exact-Fraction step-down
replay, the planted-class decisions, adjusted-p monotonicity, and the
cross-lane invariant that every Holm rejection is a BH rejection."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

from spanluke_spark.evaluation.fdr import bh_fdr
from spanluke_spark.evaluation.holm import holm_stepdown
from spanluke_spark.textops.llr import llr_keywords


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


def rnd(x: float) -> int:
    """round-half-away-from-zero (Spark/DuckDB round), NOT banker's."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ----------------------------------------------------------------- LLR


def py_llr(a, b, na, nb):
    n, c, d, ct1, ct2 = na + nb, na - a, nb - b, a + b, na - a + nb - b

    def cell(o, rt, ct):
        return o * rnd(math.log((o * n) / (rt * ct)) * 1e6) if o > 0 else 0

    return 2 * (cell(a, na, ct1) + cell(b, nb, ct1)
                + cell(c, na, ct2) + cell(d, nb, ct2))


def _run(spark, rows, top_k=50):
    df = spark.createDataFrame(rows, "fg boolean, token string")
    return llr_keywords(df, top_k=top_k).collect()


def test_llr_matches_python_replay_and_float_g2(spark):
    rows = []
    for i in range(600):
        fg = i % 3 == 0
        # planted: 'hot' token over-represented in fg, tail tokens shared
        if fg and i % 9 < 4:
            tok = "hot"
        else:
            tok = f"w{h('t', i) % 12}"
        rows.append((fg, tok))
    na = sum(1 for fg, _ in rows if fg)
    nb = len(rows) - na
    out = _run(spark, rows)
    assert out, "no keywords returned"
    for r in out:
        exp = py_llr(r["a"], r["b"], na, nb)
        assert r["llr_ppm"] == exp, r["token"]
        # float G² cross-check (quantization <= ~1e-3 per count unit)
        n = na + nb
        g2 = 0.0
        for o, rt, ct in [
            (r["a"], na, r["a"] + r["b"]),
            (r["b"], nb, r["a"] + r["b"]),
            (na - r["a"], na, n - r["a"] - r["b"]),
            (nb - r["b"], nb, n - r["a"] - r["b"]),
        ]:
            if o > 0:
                g2 += o * math.log(o * n / (rt * ct))
        assert abs(r["llr_ppm"] / 1e6 - 2 * g2) < 0.01
    top = out[0]
    assert top["token"] == "hot" and top["enriched"]


def test_llr_zero_cell_and_balanced_token(spark):
    rows = [(True, "only_fg")] * 8 + [(True, "even")] * 4 + [
        (False, "even")
    ] * 8 + [(False, "bg_w")] * 16
    # fg total 12, bg total 24: 'even' appears at rate 1/3 in BOTH
    out = {r["token"]: r for r in _run(spark, rows)}
    assert out["only_fg"]["b"] == 0 and out["only_fg"]["llr_ppm"] > 0
    assert out["only_fg"]["enriched"]
    assert out["even"]["llr_ppm"] == 0  # identical rates -> zero surprise
    assert not out["bg_w"]["enriched"]


def test_llr_top_k_and_rank_determinism(spark):
    rows = [(i % 2 == 0, f"w{i % 7}") for i in range(140)]
    out = _run(spark, rows, top_k=3)
    assert [r["rnk"] for r in out] == [1, 2, 3]
    ranked = sorted(out, key=lambda r: (-r["llr_ppm"], r["token"]))
    assert [r["token"] for r in out] == [r["token"] for r in ranked]


# ---------------------------------------------------------------- Holm


def py_holm(stats, alpha=Fraction(1, 10)):
    ps = {
        g: Fraction(sum(math.comb(n, j) for j in range(x, n + 1)), 2**n)
        for g, (n, x) in stats.items()
    }
    order = sorted(ps, key=lambda g: (ps[g], g))
    m = len(order)
    out, ok = {}, True
    padj_run = 0
    for i, g in enumerate(order, 1):
        if ps[g] > alpha / (m - i + 1):
            ok = False
        p_ppm = ps[g].numerator * 10**6 // ps[g].denominator
        padj_run = max(padj_run, min(10**6, (m - i + 1) * p_ppm))
        out[g] = (i, ok, padj_run)
        if not ok:
            ok = False
    # once failed, everything after stays failed (ok latches)
    failed = False
    for i, g in enumerate(order, 1):
        if not out[g][1]:
            failed = True
        if failed:
            out[g] = (out[g][0], False, out[g][2])
    return out


def _trials(fails, n):
    rows = []
    for g, x in fails.items():
        rows += [(g, t < x) for t in range(n)]
    return rows


def test_holm_matches_fraction_replay(spark):
    fails = {g: 8 + (h("f", g) % 12) for g in range(14)}  # 8..19 of 24
    df = spark.createDataFrame(
        _trials(fails, 24), "grp int, fail boolean"
    )
    got = {r["grp"]: r for r in holm_stepdown(df).collect()}
    exp = py_holm({g: (24, x) for g, x in fails.items()})
    for g, (rank, reject, padj) in exp.items():
        r = got[g]
        assert (r["rank"], r["reject"], r["padj_ppm"]) == (
            rank, reject, padj
        ), g


def test_holm_planted_classes_and_monotone_padj(spark):
    fails = {g: 10 + (g % 4) * 3 for g in range(12)}  # 10,13,16,19 of 20
    df = spark.createDataFrame(
        _trials(fails, 20), "grp int, fail boolean"
    )
    got = sorted(holm_stepdown(df).collect(), key=lambda r: r["rank"])
    for r in got:
        if fails[r["grp"]] == 19:
            assert r["reject"]
        if fails[r["grp"]] == 10:
            assert not r["reject"]
    padjs = [r["padj_ppm"] for r in got]
    assert padjs == sorted(padjs) and padjs[-1] <= 1_000_000
    # rejections form a prefix of the ranking (step-down contract)
    flags = [r["reject"] for r in got]
    assert flags == sorted(flags, reverse=True)


def test_holm_never_rejects_beyond_bh(spark):
    fails = {g: 6 + (h("z", g) % 14) for g in range(16)}
    df = spark.createDataFrame(
        _trials(fails, 26), "grp int, fail boolean"
    )
    holm = {r["grp"]: r["reject"] for r in holm_stepdown(df).collect()}
    bh = {r["grp"]: r["reject"] for r in bh_fdr(df).collect()}
    for g in holm:
        if holm[g]:
            assert bh[g], f"Holm rejected {g} but BH did not"
