"""Gates for textops/stylometry.py and textops/ht.py: Burrows'
Delta against a float replay, the singleton-author self-Delta == 0
lane, corpus-duplication invariance, constant-word immunity, and
same-template-docs-closest sanity; Horvitz-Thompson against a
replay that reuses the engine's own portable hash, the certainty
census lane (every pi >= 1 -> t_hat == census exactly, var == 0),
equal-size uniform-design collapse, and sample-membership exactness
(integer cross-multiplied inclusion)."""

from __future__ import annotations

from collections import Counter, defaultdict

from spanluke_spark.textops.ht import horvitz_thompson
from spanluke_spark.textops.stylometry import burrows_delta

# ---------------------------------------------------- python replays


def py_delta(rows, k_top=10):
    counts = {}
    authors = {}
    for doc, author, text in rows:
        authors[doc] = author
        counts[doc] = Counter(w for w in text.split() if w)
    tot = Counter()
    for c in counts.values():
        tot.update(c)
    panel = sorted(tot, key=lambda w: (-tot[w], w))[:k_top]
    f = {
        (d, w): counts[d].get(w, 0) / sum(counts[d].values())
        for d in counts
        for w in panel
    }
    n = len(counts)
    stats = {}
    for w in panel:
        vals = [f[(d, w)] for d in counts]
        mu = sum(vals) / n
        var = sum((v - mu) ** 2 for v in vals) / n
        stats[w] = (mu, var**0.5)
    live = [w for w in panel if stats[w][1] > 0]
    z = {
        (d, w): (f[(d, w)] - stats[w][0]) / stats[w][1]
        for d in counts
        for w in live
    }
    cents = defaultdict(lambda: defaultdict(list))
    for d in counts:
        for w in live:
            cents[authors[d]][w].append(z[(d, w)])
    out = {}
    for d in counts:
        for a in cents:
            dd = sum(
                abs(z[(d, w)] - sum(cents[a][w]) / len(cents[a][w]))
                for w in live
            ) / len(live)
            out[(d, a)] = {"k_eff": len(live), "delta": round(dd, 6)}
    return out


def _run_delta(spark, rows, k_top=10):
    df = spark.createDataFrame(
        list(rows), "doc_id long, author string, text string"
    )
    out = {}
    for r in burrows_delta(df, k_top=k_top).collect():
        d = r.asDict()
        out[(d.pop("doc_id"), d.pop("candidate"))] = d
    return out


def _run_ht(spark, rows, k):
    df = spark.createDataFrame(list(rows), "id string, s long, y long")
    return horvitz_thompson(df, k).collect()[0].asDict()


DOCS = [
    (0, "A", "the of and the to in the of a cat"),
    (1, "A", "the of the and to the of in a dog"),
    (2, "B", "a to a of a the in and a bird the a"),
    (3, "B", "a of a to the a in a and tree"),
    (4, "A", "the and of to the in of the a mouse"),
    (5, "B", "a to of a the a and in a stone a"),
]


def test_delta_matches_replay(spark):
    got = _run_delta(spark, DOCS, k_top=6)
    exp = py_delta(DOCS, k_top=6)
    assert set(got) == set(exp)
    for key in got:
        assert got[key]["k_eff"] == exp[key]["k_eff"]
        assert abs(got[key]["delta"] - exp[key]["delta"]) <= 2e-6


def test_delta_own_author_closer_on_styled_corpus(spark):
    got = _run_delta(spark, DOCS, k_top=6)
    for d, author in [(0, "A"), (1, "A"), (2, "B"), (3, "B")]:
        other = "B" if author == "A" else "A"
        assert got[(d, author)]["delta"] < got[(d, other)]["delta"]


def test_delta_singleton_author_self_zero(spark):
    rows = DOCS + [(9, "LONE", "the a of to in and zebra zebra")]
    got = _run_delta(spark, rows, k_top=6)
    assert got[(9, "LONE")]["delta"] == 0.0


def test_delta_duplication_invariance(spark):
    dup = DOCS + [
        (d + 100, a, t) for d, a, t in DOCS
    ]
    got = _run_delta(spark, DOCS, k_top=6)
    got_dup = _run_delta(spark, dup, k_top=6)
    for (d, a), v in got.items():
        assert abs(v["delta"] - got_dup[(d, a)]["delta"]) <= 2e-6


def test_delta_constant_word_dropped(spark):
    # 'the' appears exactly 3x in every doc -> f constant -> sigma 0
    rows = [
        (0, "A", "the the the cat cat dog"),
        (1, "A", "the the the cat dog dog"),
        (2, "B", "the the the dog dog dog"),
        (3, "B", "the the the dog cat cat"),
    ]
    got = _run_delta(spark, rows, k_top=3)
    exp = py_delta(rows, k_top=3)
    assert all(v["k_eff"] == 2 for v in got.values())
    for key in got:
        assert abs(got[key]["delta"] - exp[key]["delta"]) <= 2e-6


# ------------------------------------------------------------------ HT


ROWS = [(f"u{i}", 1 + (i * 3) % 7, 5 + (i * 7) % 11) for i in range(40)]


def test_ht_certainty_census(spark):
    got = _run_ht(spark, ROWS, k=10_000)
    assert got["n_sample"] == got["n_pop"] == 40
    assert got["t_hat_milli"] == got["census_milli"]
    assert got["var_hat_milli"] == 0


def test_ht_matches_portable_hash_replay(spark):
    from pyspark.sql import functions as F

    from spanluke_spark.dedup.dedup import portable_hash64

    k = 12
    hdf = spark.createDataFrame(
        [(r[0],) for r in ROWS], "id string"
    ).select(
        "id", F.pmod(portable_hash64(F.col("id")), F.lit(10**6)).alias("u")
    )
    u = {r["id"]: r["u"] for r in hdf.collect()}
    S = sum(s for _, s, _ in ROWS)
    t = v = ns = 0
    for i, s, y in ROWS:
        if k * s >= S:
            ns += 1
            t += 1000 * y
        elif u[i] * S < 10**6 * k * s:
            ns += 1
            t += 1000 * y * S // (k * s)
            v += 1000 * (S - k * s) * y * y * S // (k * k * s * s)
    got = _run_ht(spark, ROWS, k=k)
    assert got["n_sample"] == ns
    assert got["t_hat_milli"] == t
    assert got["var_hat_milli"] == v
    # a useful design actually subsamples
    assert 0 < ns < len(ROWS)


def test_ht_equal_sizes_uniform_collapse(spark):
    rows = [(f"p{i}", 1, 10 + i % 5) for i in range(30)]
    k = 8
    got = _run_ht(spark, rows, k=k)
    # every pi = k/N: t_cell = 1000*y*N div k identically
    from pyspark.sql import functions as F

    from spanluke_spark.dedup.dedup import portable_hash64

    hdf = spark.createDataFrame(
        [(r[0],) for r in rows], "id string"
    ).select(
        "id", F.pmod(portable_hash64(F.col("id")), F.lit(10**6)).alias("u")
    )
    u = {r["id"]: r["u"] for r in hdf.collect()}
    drawn = [r for r in rows if u[r[0]] * 30 < 10**6 * k]
    assert got["n_sample"] == len(drawn)
    assert got["t_hat_milli"] == sum(
        1000 * y * 30 // k for _, _, y in drawn
    )
