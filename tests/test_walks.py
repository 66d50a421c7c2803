"""Deterministic walk generation: hand-checked step rule, dangling stop,
reproducibility, and per-repeat divergence."""

from __future__ import annotations

from spanluke_spark.graph.walks import deterministic_walks


def _run(spark, edges, starts, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(n,) for n in starts], "node long")
    rows = deterministic_walks(e, s, **kw).collect()
    walks = {}
    for r in sorted(rows, key=lambda r: (r.walk_id, r.step)):
        walks.setdefault(r.walk_id, []).append(r.node)
    return walks


def test_single_outedge_is_always_taken_and_dangling_stops(spark):
    # 0 -> 1 -> 2, 2 dangling: any hash mod 1 == 0, so the path is forced
    walks = _run(spark, [(0, 1), (1, 2)], [0], length=5, repeats=1)
    assert walks == {"0#0": [0, 1, 2]}


def test_deterministic_across_runs_and_repeats_diverge(spark):
    edges = [(i, (i + 1) % 8) for i in range(8)] + [(i, (i + 3) % 8) for i in range(8)]
    w1 = _run(spark, edges, range(8), length=6, repeats=2)
    w2 = _run(spark, edges, range(8), length=6, repeats=2)
    assert w1 == w2  # bit-identical re-run
    assert len(w1) == 16 and all(len(p) == 7 for p in w1.values())
    # the salt includes the walk id, so sibling walks are not clones
    assert any(w1[f"{n}#0"] != w1[f"{n}#1"] for n in range(8))


def test_choice_matches_hash_rule(spark):
    # node 0 has neighbors [1, 5] (dst-sorted); replicate the pick by hand
    import hashlib

    def pick(walk_id, step, node, deg):
        h = int(hashlib.md5(f"{walk_id}:{step}:{node}".encode()).hexdigest()[:15], 16)
        return h % deg

    walks = _run(spark, [(0, 5), (0, 1)], [0], length=1, repeats=1)
    expected = [1, 5][pick("0#0", 1, 0, 2)]
    assert walks["0#0"] == [0, expected]
