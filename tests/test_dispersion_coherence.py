"""Gates for Gries' DP dispersion (textops/dispersion.py) and UMass
topic coherence (textops/coherence.py): DP against an exact integer
replay, the proportional-spread exact-0 lane, the single-part
(N - N_i)/N closed form, and the absent-part contribution (dropping
a token from one part must RAISE its DP); coherence against a
half-away-round ln-ppm replay, the always-co-occurring positive
closed form sum ln((D+1)/D), the disjoint-words negative lane, the
rank-order asymmetry (conditioning on the rarer word changes the
score), and the absent-conditioning-word n_undefined contract."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from spanluke_spark.textops.coherence import umass_coherence
from spanluke_spark.textops.dispersion import dispersion_dp


def rnd(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ------------------------------------------------------------ dispersion


def py_dp(occ, min_count):
    ni = Counter(p for p, _ in occ)
    n = sum(ni.values())
    cnt = Counter(occ)
    ft = Counter()
    for (_, t), f in cnt.items():
        ft[t] += f
    out = {}
    for t, f_total in ft.items():
        if f_total < min_count:
            continue
        dev = sum(
            abs(cnt.get((p, t), 0) * n - npart * f_total)
            for p, npart in ni.items()
        )
        out[t] = (
            f_total,
            len(ni),
            dev,
            dev * 1_000_000 // (2 * f_total * n),
        )
    return out


def _run_dp(spark, occ, min_count=1):
    df = spark.createDataFrame(occ, "part long, token string")
    return {
        r["token"]: (r["f_total"], r["n_parts"], r["dp_num"], r["dp_ppm"])
        for r in dispersion_dp(df, min_count=min_count).collect()
    }


def test_dp_matches_replay(spark):
    occ = [((i * 3) % 5, f"t{(i * i) % 9}") for i in range(500)]
    assert _run_dp(spark, occ, min_count=20) == py_dp(occ, 20)


def test_dp_proportional_is_zero_single_part_closed_form(spark):
    # 'even' appears equally in every equal-sized part -> follows the
    # part sizes exactly -> DP = 0
    occ = [(p, "even") for p in range(4) for _ in range(10)] + [
        (p, f"fill{i}") for p in range(4) for i in range(10)
    ]
    got = _run_dp(spark, occ)
    assert got["even"][2] == 0 and got["even"][3] == 0
    # 'solo' lives only in part 0 with equal part sizes of 20:
    # DP = (N - N_0)/N = 60/80 exactly
    occ2 = [(p, "pad") for p in range(4) for _ in range(19)] + [
        (0, "solo"),
        (1, "bal"),
        (2, "bal"),
        (3, "bal"),
    ]
    got2 = _run_dp(spark, occ2)
    assert got2 == py_dp(occ2, 1)
    # dp_num = |1*80 - 20| + 3*20 = 120; DP = 120/(2*80) = (N-N0)/N
    assert got2["solo"][2] == 120
    assert got2["solo"][3] == 750_000


def test_dp_concentration_raises_score(spark):
    spread = [(p, "w") for p in range(4) for _ in range(5)] + [
        (p, "pad") for p in range(4) for _ in range(5)
    ]
    piled = [(0, "w")] * 20 + [(p, "pad") for p in range(4)
                               for _ in range(5)]
    assert _run_dp(spark, piled)["w"][3] > _run_dp(spark, spread)["w"][3]


# ------------------------------------------------------------- coherence


def py_umass(docs, topics):
    """docs: {doc: set(words)}."""
    dfreq = Counter()
    for ws in docs.values():
        dfreq.update(ws)
    codf = defaultdict(int)
    out = {}
    for tid, ws in topics.items():
        n_pairs = n_undef = coh = 0
        for i in range(1, len(ws)):
            for j in range(i):
                wi, wj = ws[i], ws[j]
                dj = dfreq[wj]
                if dj == 0:
                    n_undef += 1
                    continue
                dij = sum(
                    1 for s in docs.values() if wi in s and wj in s
                )
                coh += rnd(math.log((dij + 1) / dj) * 1_000_000)
                n_pairs += 1
        mean = (
            None
            if n_pairs == 0
            else (-(abs(coh) // n_pairs) if coh < 0 else coh // n_pairs)
        )
        out[tid] = (n_pairs, n_undef, coh, mean)
    return out


def _run_umass(spark, docs, topics):
    rows = [(d, w) for d, ws in docs.items() for w in ws]
    df = spark.createDataFrame(rows, "doc_id long, token string")
    return {
        r["topic_id"]: (
            r["n_pairs"],
            r["n_undefined"],
            r["coh_num"],
            r["mean_pair_ppm"],
        )
        for r in umass_coherence(df, topics).collect()
    }


def test_umass_matches_replay_and_signs(spark):
    docs = {
        i: {
            w
            for w in ("a", "b", "c", "x", "y")
            if (i * 7 + ord(w)) % 3 != 0
        }
        for i in range(60)
    }
    topics = {0: ["a", "b", "c"], 1: ["x", "y"], 2: ["ghost", "a"],
              3: ["a", "ghost"]}
    got = _run_umass(spark, docs, topics)
    assert got == py_umass(docs, topics)
    # topic 2 = [ghost, a]: the pair conditions on the ABSENT 'ghost'
    # (wj is the earlier-ranked word) -> undefined
    assert got[2][0] == 0 and got[2][1] == 1 and got[2][3] is None
    # topic 3 = [a, ghost]: conditions on the PRESENT 'a' with the
    # D(ghost, a) = 0 numerator smoothed to 1 -> exactly ln(1/D(a))
    assert got[3][0] == 1 and got[3][1] == 0
    assert got[3][2] == rnd(math.log(1 / 40) * 1_000_000) < 0


def test_umass_cooccur_positive_disjoint_negative(spark):
    docs = {i: {"p", "q"} if i < 30 else {"u" if i % 2 else "v"}
            for i in range(60)}
    topics = {0: ["p", "q"], 1: ["u", "v"]}
    got = _run_umass(spark, docs, topics)
    # always co-occur: ln((30+1)/30) > 0 exactly
    assert got[0][2] == rnd(math.log(31 / 30) * 1_000_000) > 0
    # never co-occur: ln(1/D) < 0
    assert got[1][2] == rnd(math.log(1 / 15) * 1_000_000) < 0


def test_umass_rank_order_matters(spark):
    """Conditioning word is the earlier-ranked one: swapping the
    order divides by a different D."""
    docs = {i: ({"r"} if i % 2 else {"r", "s"}) for i in range(40)}
    a = _run_umass(spark, docs, {0: ["r", "s"]})  # condition on r
    b = _run_umass(spark, docs, {0: ["s", "r"]})  # condition on s
    assert a[0][2] != b[0][2]
