"""SymSpell delete-1 correction — brute-force parity (the delete-key
candidate generation must be LOSSLESS for distance 1), tie-break
contract (dist, then freq desc, then term), identity correction,
distance-2 exclusion, and the max_len drop gate."""

from __future__ import annotations

import random
import string

from spanluke_spark.link.editdist import symspell_correct


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(dictionary, queries):
    out = {}
    for q in set(queries):
        best = None
        for term, freq in dictionary:
            d = _lev(q, term)
            if d <= 1:
                key = (d, -freq, term)
                if best is None or key < best[0]:
                    best = (key, term, d, freq)
        if best:
            out[q] = (best[1], best[2], best[3])
    return out


def _spark(spark, dictionary, queries):
    d = spark.createDataFrame(dictionary, "term: string, freq: long")
    q = spark.createDataFrame([(x,) for x in queries], "query: string")
    rows = symspell_correct(d, q).collect()
    return {r["query"]: (r["term"], r["dist"], r["freq"]) for r in rows}


def test_brute_force_parity_random(spark):
    rng = random.Random(4)
    vocab = ["".join(rng.choices(string.ascii_lowercase[:6], k=rng.randint(3, 7)))
             for _ in range(40)]
    dictionary = [(w, rng.randint(1, 100)) for w in sorted(set(vocab))]
    queries = []
    for w, _ in dictionary[:25]:
        queries.append(w)                      # dist 0
        queries.append(w[1:])                  # deletion
        queries.append(w + "z")                # insertion
        i = rng.randrange(len(w))
        queries.append(w[:i] + "z" + w[i + 1:])  # substitution
        queries.append("zz" + w)               # dist 2 -> no match
    assert _spark(spark, dictionary, queries) == _brute(dictionary, queries)


def test_tie_break_freq_then_term(spark):
    dictionary = [("cata", 5), ("catb", 9), ("catc", 9)]
    got = _spark(spark, dictionary, ["cat"])
    assert got["cat"] == ("catb", 1, 9)  # freq desc wins, then term asc


def test_dist0_beats_freq(spark):
    dictionary = [("cat", 1), ("cart", 1000)]
    got = _spark(spark, dictionary, ["cat"])
    assert got["cat"] == ("cat", 0, 1)


def test_max_len_gate(spark):
    long_term = "x" * 30
    got = _spark(spark, [(long_term, 10)], [long_term, "x" * 29])
    assert got == {}  # both sides dropped above max_len=24


def test_distance_two_never_matches(spark):
    got = _spark(spark, [("abcdef", 3)], ["abqqef", "qqabcdef", "abcd"])
    assert got == {}  # two subs / two inserts / two deletes


def test_plan_audit_no_cartesian(spark):
    """The candidate join must be a content-keyed equi-join — no
    cartesian / nested-loop anywhere in the plan."""
    d = spark.createDataFrame([("term%d" % i, i) for i in range(30)], "term: string, freq: long")
    q = spark.createDataFrame([("term%d" % i,) for i in range(10)], "query: string")
    plan = symspell_correct(d, q)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
