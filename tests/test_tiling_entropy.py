"""TextTiling (textops/texttiling.py) and bigram entropy
(textops/entropy.py) gates: a planted two-topic document whose
boundary gap is found, a uniform document with no boundary, a Python
replay of the full sim/peak/depth chain including the run-labeled
climb; entropy anchors — deterministic text H(W|C) = 0, uniform
random-ish text H(W|C) ~ H(W), bit-exact Python replay and the
plug-in identity checks."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.textops.entropy import bigram_entropy
from spanluke_spark.textops.texttiling import texttiling


def py_tile(tokens, block=5):
    nb = (len(tokens) + block - 1) // block
    blocks = [
        Counter(tokens[i * block : (i + 1) * block]) for i in range(nb)
    ]
    gaps = [g for g in range(2, nb - 1)]
    sims = {}
    for g in gaps:
        left = blocks[g - 2] + blocks[g - 1]
        right = blocks[g] + blocks[g + 1]
        dot = sum(left[w] * right.get(w, 0) for w in left)
        nl = sum(v * v for v in left.values())
        nr = sum(v * v for v in right.values())
        sims[g] = (dot, nl, nr, dot * dot * 1_000_000 // (nl * nr))
    # peak climb
    out = {}
    svals = {g: sims[g][3] for g in gaps}
    for g in gaps:
        lp = svals[g]
        j = g
        while j > gaps[0] and svals[j - 1] >= svals[j]:
            j -= 1
            lp = svals[j]
        rp = svals[g]
        j = g
        while j < gaps[-1] and svals[j + 1] >= svals[j]:
            j += 1
            rp = svals[j]
        out[g] = sims[g] + (lp + rp - 2 * svals[g],)
    n = len(gaps)
    sd = sum(v[4] for v in out.values())
    return {
        g: v + (v[4] > 0 and n * v[4] > sd,) for g, v in out.items()
    }


def tile_fixture():
    # two planted topics: words a* then words b*, 30 tokens each
    topic_a = [f"a{i % 5}" for i in range(30)]
    topic_b = [f"b{i % 5}" for i in range(30)]
    return topic_a + topic_b


def test_texttiling_matches_python_replay_and_finds_boundary(spark):
    toks = tile_fixture()
    df = spark.createDataFrame([(1, " ".join(toks))], "id long, text string")
    got = {r["g"]: r for r in texttiling(df, block=5).collect()}
    want = py_tile(toks, block=5)
    assert set(got) == set(want)
    for g, (dot, nl, nr, sim, depth, boundary) in want.items():
        r = got[g]
        assert (
            r["dot"],
            r["nl"],
            r["nr"],
            r["sim2_ppm"],
            r["depth_ppm"],
            r["boundary"],
        ) == (dot, nl, nr, sim, depth, boundary), g
    # the topic switch is at token 30 = block boundary g = 6
    assert got[6]["boundary"] and got[6]["sim2_ppm"] == 0
    # interior gaps inside a topic are fully cohesive, no boundary
    assert got[3]["sim2_ppm"] == 1_000_000 and not got[3]["boundary"]


def test_texttiling_uniform_doc_has_no_boundary(spark):
    toks = [f"w{i % 4}" for i in range(60)]
    df = spark.createDataFrame([(1, " ".join(toks))], "id long, text string")
    rows = texttiling(df, block=5).collect()
    assert rows and all(not r["boundary"] for r in rows)
    # short docs (< 4 blocks) emit nothing
    short = spark.createDataFrame([(2, "a b c d e f")], "id long, text string")
    assert texttiling(short, block=5).count() == 0


def py_entropy(texts):
    ncw: Counter = Counter()
    for t in texts:
        ws = [w for w in t.split() if w]
        for c, w in zip(ws, ws[1:]):
            ncw[(c, w)] += 1
    nc: Counter = Counter()
    nw: Counter = Counter()
    for (c, w), k in ncw.items():
        nc[c] += k
        nw[w] += k
    n = sum(ncw.values())
    q = lambda a, b: int(round(math.log(a / b) * 1_000_000))
    s_wc = sum(k * q(k, nc[c]) for (c, w), k in ncw.items())
    s_w = sum(k * q(k, n) for w, k in nw.items())
    return {
        "n_bigrams": n,
        "n_contexts": len(nc),
        "n_words": len(nw),
        "h_w_ppm": (-s_w) // n,
        "h_wc_ppm": (-s_wc) // n,
        "mi_ppm": (-s_w) // n - (-s_wc) // n,
    }


def test_entropy_matches_python_replay(spark):
    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog met the cat",
    ]
    df = spark.createDataFrame([("g", t) for t in texts], "grp string, text string")
    r = bigram_entropy(df).collect()[0]
    want = py_entropy(texts)
    for k, v in want.items():
        assert r[k] == v, k


def test_entropy_anchors(spark):
    # deterministic cycle: every context has exactly one successor
    det = " ".join(["x y z"] * 20)
    # high-entropy: quadratic residues give each token many distinct
    # successors (a linear stream like (i*c) % m is a CYCLE -> H=0)
    noisy = " ".join(f"t{(i * i) % 23}" for i in range(400))
    df = spark.createDataFrame(
        [("det", det), ("noisy", noisy)], "grp string, text string"
    )
    got = {r["grp"]: r for r in bigram_entropy(df).collect()}
    assert got["det"]["h_wc_ppm"] == 0  # next token fully determined
    assert got["det"]["mi_ppm"] == got["det"]["h_w_ppm"]
    nz = got["noisy"]
    # varied successors: strictly between the two extremes, MI > 0
    assert 0 < nz["h_wc_ppm"] < nz["h_w_ppm"]
    assert nz["mi_ppm"] > 0
