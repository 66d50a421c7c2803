"""Gates for chrF (evaluation/chrf.py) and LRU stack-distance hit
curves (etl/cache.py): chrF against a bit-exact Python replay of the
same once-quantized discipline on md5-random strings, hand-computed
and semantic anchors (identity, whitespace insensitivity, disjoint
alphabets, effective-order truncation); stack distances against an
explicit LRU-stack simulation and the hit curve against a real
OrderedDict LRU cache run at every capacity (the Mattson inclusion
property is the claim — one histogram prices every capacity)."""

from __future__ import annotations

import hashlib
from collections import Counter, OrderedDict

from spanluke_spark.etl.cache import lru_hit_curve, stack_distances
from spanluke_spark.evaluation.chrf import chrf


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


# ---------------------------------------------------------------- chrF


def py_chrf(hyp: str, ref: str):
    """Bit-exact replay of chrf()'s once-quantized discipline."""
    hs = "".join(hyp.split())
    rs = "".join(ref.split())
    if not hs or not rs:
        return None
    sp = sr = eff = 0
    for n in range(1, 7):
        hg = Counter(hs[i : i + n] for i in range(len(hs) - n + 1))
        rg = Counter(rs[i : i + n] for i in range(len(rs) - n + 1))
        if not hg or not rg:
            continue
        m = sum(min(c, rg[g]) for g, c in hg.items())
        ht, rt = sum(hg.values()), sum(rg.values())
        sp += m * 1_000_000 // ht
        sr += m * 1_000_000 // rt
        eff += 1
    p, r = sp // eff, sr // eff
    f = 0 if p + r == 0 else 5 * p * r // (4 * p + r)
    return {
        "h_chars": len(hs),
        "r_chars": len(rs),
        "eff": eff,
        "p_ppm": p,
        "r_ppm": r,
        "chrf_ppm": f,
    }


def _run_chrf(spark, pairs):
    df = spark.createDataFrame(pairs, "pair_id long, hyp string, ref string")
    return {r["pair_id"]: r.asDict() for r in chrf(df).collect()}


def test_chrf_matches_python_replay_on_random_strings(spark):
    alpha = "abcdefg "
    pairs = []
    for i in range(40):
        hyp = "".join(alpha[h("h", i, j) % len(alpha)] for j in range(h("lh", i) % 30 + 1))
        ref = "".join(alpha[h("r", i, j) % len(alpha)] for j in range(h("lr", i) % 30 + 1))
        pairs.append((i, hyp, ref))
    got = _run_chrf(spark, pairs)
    n_defined = 0
    for i, hyp, ref in pairs:
        exp = py_chrf(hyp, ref)
        if exp is None:
            assert i not in got  # all-whitespace side -> dropped
            continue
        n_defined += 1
        row = got[i]
        for k, v in exp.items():
            assert row[k] == v, (i, k, hyp, ref)
    assert n_defined >= 30  # the replay actually exercised the formula


def test_chrf_hand_anchor_and_identity(spark):
    got = _run_chrf(
        spark,
        [
            (1, "ab", "abc"),
            (2, "general kenobi", "generalkenobi"),
            (3, "aaaa", "bbbb"),
        ],
    )
    # hand-computed: eff=2; P=(1e6+1e6)//2; R=(666666+500000)//2
    r1 = got[1]
    assert (r1["eff"], r1["p_ppm"], r1["r_ppm"]) == (2, 1_000_000, 583_333)
    assert r1["chrf_ppm"] == 5 * 1_000_000 * 583_333 // (4 * 1_000_000 + 583_333)
    # whitespace never counts: identical after stripping -> perfect score
    assert got[2]["chrf_ppm"] == 1_000_000 and got[2]["eff"] == 6
    # disjoint alphabets -> zero, and the 0/0 F-combination guard holds
    assert got[3]["chrf_ppm"] == 0 and got[3]["p_ppm"] == 0


def test_chrf_effective_order_truncates_to_shorter_side(spark):
    # len(hyp)=3 vs len(ref)=20: orders 4..6 have no hyp grams -> eff=3
    got = _run_chrf(spark, [(1, "abc", "abcabcabcabcabcabcab")])
    assert got[1]["eff"] == 3


# ----------------------------------------------------- LRU stack dist


def _trace(n_hosts=3, n=120):
    rows = []
    for host in range(n_hosts):
        for pos in range(n):
            rows.append((host, pos, h("k", host, pos) % (4 + 3 * host)))
    return rows


def py_stack_distances(trace):
    """Explicit LRU stack per host: depth of the key when accessed."""
    out = {}
    stacks: dict[int, list] = {}
    for host, pos, key in sorted(trace):
        st = stacks.setdefault(host, [])
        if key in st:
            d = st.index(key) + 1
            st.remove(key)
            out[(host, pos)] = d
        else:
            out[(host, pos)] = None
        st.insert(0, key)
    return out


def py_lru_hits(trace, cap):
    """Real OrderedDict LRU cache of capacity cap, per host."""
    hits = {}
    caches: dict[int, OrderedDict] = {}
    for host, pos, key in sorted(trace):
        c = caches.setdefault(host, OrderedDict())
        if key in c:
            c.move_to_end(key)
            hits[host] = hits.get(host, 0) + 1
        else:
            c[key] = True
            if len(c) > cap:
                c.popitem(last=False)
        hits.setdefault(host, hits.get(host, 0))
    return hits


def test_stack_distances_match_explicit_lru_stack(spark):
    trace = _trace()
    df = spark.createDataFrame(trace, "host int, pos int, key int")
    got = {(r["host"], r["pos"]): r["sd"] for r in stack_distances(df).collect()}
    exp = py_stack_distances(trace)
    assert got == exp
    # cold misses == distinct keys per host
    for host in range(3):
        n_cold = sum(
            1 for (hh, _), sd in got.items() if hh == host and sd is None
        )
        assert n_cold == len({k for hh, _, k in trace if hh == host})


def test_hit_curve_equals_real_lru_cache_at_every_capacity(spark):
    trace = _trace()
    df = spark.createDataFrame(trace, "host int, pos int, key int")
    caps = [1, 2, 3, 5, 9, 64]
    rows = lru_hit_curve(df, capacities=caps).collect()
    got = {(r["host"], r["c"]): (r["hits"], r["total"], r["hit_ppm"]) for r in rows}
    assert len(got) == 3 * len(caps)
    for cap in caps:
        exp = py_lru_hits(trace, cap)
        for host in range(3):
            hits, total, ppm = got[(host, cap)]
            assert total == 120
            assert hits == exp[host], (host, cap)
            assert ppm == hits * 1_000_000 // total
    # monotone in capacity, and cap=64 >= #keys recovers ALL warm hits
    for host in range(3):
        series = [got[(host, c)][0] for c in caps]
        assert series == sorted(series)
        n_keys = len({k for hh, _, k in trace if hh == host})
        assert got[(host, 64)][0] == 120 - n_keys
