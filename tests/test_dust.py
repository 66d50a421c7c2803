"""DUST rule mining (etl/dust.py) gates: Python replay of the
prefix/suffix substitution decomposition on every pair, the
reconstruction invariant (p·alpha·q == u and p·beta·q == v), the
support threshold separating site-wide rewrite laws from
pair-specific noise, and the per-cluster pair cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.etl.dust import common_prefix_len, mine_dust_rules


def py_rule(u: str, v: str) -> tuple[str, str]:
    n = min(len(u), len(v))
    lcp = 0
    while lcp < n and u[lcp] == v[lcp]:
        lcp += 1
    lcs = 0
    while lcs < n and u[len(u) - 1 - lcs] == v[len(v) - 1 - lcs]:
        lcs += 1
    s = min(lcs, n - lcp)
    return u[lcp: len(u) - s], v[lcp: len(v) - s]


def site_urls():
    rows = []
    for k in range(30):
        rows.append((k, f"http://a.com/p/{k}"))
        rows.append((k, f"http://a.com/p/{k}/index.html"))
        rows.append((k, f"http://www.a.com/p/{k}"))
        rows.append((k, f"https://a.com/p/{k}"))
    return rows


def test_common_prefix_len(spark):
    cases = [
        ("abc", "abd", 2),
        ("abc", "abc", 3),
        ("abc", "xbc", 0),
        ("ab", "abcd", 2),
        ("", "abc", 0),
    ]
    df = spark.createDataFrame(
        [(i, u, v) for i, (u, v, _) in enumerate(cases)], "i int, u string, v string"
    )
    got = {
        r["i"]: r["n"]
        for r in df.select(
            "i", common_prefix_len(F.col("u"), F.col("v")).alias("n")
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == want


def test_rules_match_python_replay_and_reconstruct(spark):
    rows = site_urls()
    df = spark.createDataFrame(rows, "content_key long, url string")
    got = {
        (r["alpha"], r["beta"]): (r["support"], r["n_clusters"])
        for r in mine_dust_rules(df, min_support=1).collect()
    }
    # python replay over all within-cluster pairs
    from collections import defaultdict

    by_k = defaultdict(set)
    for k, u in rows:
        by_k[k].add(u)
    support = defaultdict(lambda: [0, set()])
    for k, urls in by_k.items():
        us = sorted(urls)
        for i in range(len(us)):
            for j in range(i + 1, len(us)):
                u, v = us[i], us[j]
                a, b2 = py_rule(u, v)
                # reconstruction invariant: u = p+a+q, v = p+b+q
                n = min(len(u), len(v))
                p_len = 0
                while p_len < n and u[p_len] == v[p_len]:
                    p_len += 1
                q_len = len(u) - p_len - len(a)
                assert u == u[:p_len] + a + (u[len(u) - q_len:] if q_len else "")
                assert v == v[:p_len] + b2 + (v[len(v) - q_len:] if q_len else "")
                support[(a, b2)][0] += 1
                support[(a, b2)][1].add(k)
    want = {k: (c, len(ks)) for k, (c, ks) in support.items()}
    assert got == want
    # the four site-wide rewrite laws dominate
    assert got[("", "/index.html")] == (30, 30)
    assert got[("", "www.")] == (30, 30)
    assert got[("", "s")] == (30, 30)
    assert got[("://www.", "s://")] == (30, 30)


def test_min_support_drops_pair_specific_noise(spark):
    df = spark.createDataFrame(site_urls(), "content_key long, url string")
    strong = mine_dust_rules(df, min_support=10).collect()
    assert {(r["alpha"], r["beta"]) for r in strong} == {
        ("", "/index.html"),
        ("", "www."),
        ("", "s"),
        ("://www.", "s://"),
    }
    for r in strong:
        assert r["support"] == 30 and r["n_clusters"] == 30


def test_max_cluster_caps_pairs(spark):
    # one 20-url cluster: without the cap 190 pairs, with max_cluster=8 -> 28
    rows = [(0, f"http://big.com/x{i:02d}") for i in range(20)]
    df = spark.createDataFrame(rows, "content_key long, url string")
    out = mine_dust_rules(df, min_support=1)
    total_pairs = out.agg(F.sum("support")).collect()[0][0]
    assert total_pairs == 28


def test_duplicate_urls_collapse_before_pairing(spark):
    rows = [(0, "http://a.com/1"), (0, "http://a.com/1"), (0, "http://a.com/1/index.html")]
    df = spark.createDataFrame(rows, "content_key long, url string")
    out = mine_dust_rules(df, min_support=1).collect()
    assert len(out) == 1 and out[0]["support"] == 1
