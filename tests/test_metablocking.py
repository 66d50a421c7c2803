"""Meta-blocking gates (link/metablocking.py): Python replay parity on
random entity names, block purging of stop tokens, and the WNP
keep-if-either-endpoint-keeps rule with its exact-integer mean test.
"""

import re
from collections import Counter, defaultdict

import numpy as np

from spanluke_spark.link.metablocking import metablock_pairs, token_blocks


def ref_metablock(rows, min_len=2, max_block=50):
    toks = defaultdict(set)
    for i, name in rows:
        for t in set(re.split(r"[^a-z0-9]+", name.lower())):
            if len(t) >= min_len:
                toks[t].add(i)
    weights = Counter()
    for t, ids in toks.items():
        if 2 <= len(ids) <= max_block:
            ids = sorted(ids)
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    weights[(ids[x], ids[y])] += 1
    sums, counts = Counter(), Counter()
    for (a, b), w in weights.items():
        sums[a] += w
        sums[b] += w
        counts[a] += 1
        counts[b] += 1
    return {
        p: w
        for p, w in weights.items()
        if w * counts[p[0]] >= sums[p[0]] or w * counts[p[1]] >= sums[p[1]]
    }


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, name string")


def test_block_purging_and_singletons(spark):
    rows = [(i, f"inc u{i} shared") for i in range(6)] + [(99, "lonely zz")]
    # cap 4: 'inc'/'shared' blocks (6 members) purged; u{i} singletons
    # dropped; 'lonely'/'zz' singleton blocks dropped
    got = token_blocks(_df(spark, rows), max_block_size=4).collect()
    assert got == []
    # cap 6 keeps the two shared blocks
    toks = {r.token for r in
            token_blocks(_df(spark, rows), max_block_size=6).collect()}
    assert toks == {"inc", "shared"}


def test_wnp_keeps_redundant_pairs(spark):
    rows = [
        (1, "acme steel works"),
        (2, "acme steel works ltd"),  # shares 3 blocks with 1
        (3, "acme glass"),            # shares only 'acme' with 1/2
        (4, "glass house"),           # shares 'glass' with 3/5
        (5, "acme glass panes"),      # shares 2 blocks with 3
    ]
    got = {(r.id_a, r.id_b): r.weight
           for r in metablock_pairs(_df(spark, rows)).collect()}
    assert got == ref_metablock(rows)
    assert got[(1, 2)] == 3          # the redundant pairs survive
    assert got[(3, 5)] == 2
    # 'acme'-only coincidences are below BOTH endpoints' means -> pruned
    for p in [(1, 3), (2, 3), (1, 5), (2, 5)]:
        assert p not in got, p
    # weight-1 pair kept because it IS endpoint 4's neighborhood mean
    assert got[(3, 4)] == 1


def test_random_parity(spark):
    rng = np.random.default_rng(195)
    parts1 = ["acme", "globex", "initech", "umbrella"]
    parts2 = ["corp", "ltd", "inc", "gmbh"]
    for trial in range(3):
        rows = [
            (int(i),
             f"{parts1[rng.integers(0, 4)]} {parts2[rng.integers(0, 4)]} "
             f"u{rng.integers(0, 10)} v{rng.integers(0, 6)}")
            for i in range(40)
        ]
        got = {(r.id_a, r.id_b): r.weight
               for r in metablock_pairs(_df(spark, rows),
                                        max_block_size=25).collect()}
        assert got == ref_metablock(rows, max_block=25), trial


def test_min_len_filters_noise_tokens(spark):
    rows = [(1, "a b acme"), (2, "a c acme")]
    toks = {r.token for r in token_blocks(_df(spark, rows)).collect()}
    assert toks == {"acme"}  # 1-char tokens never form blocks
