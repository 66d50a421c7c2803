"""Prefix-filtered all-pairs Jaccard: completeness vs a python brute force
on randomized corpora, integer decision rule, and actual pruning."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spanluke_spark.textops.allpairs import allpairs_jaccard, doc_term_sets


def _brute(sets, t_num, t_den):
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and t_den * inter >= t_num * uni:
                out[(a, b)] = (inter, uni)
    return out


def test_complete_vs_brute_force_random(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(30)]
    sets = {
        i: set(rng.sample(vocab, rng.randint(3, 12))) for i in range(60)
    }
    rows = [(i, t) for i, ts in sets.items() for t in ts]
    sdf = spark.createDataFrame(rows, "doc_id long, term string")
    got = {
        (r.id_a, r.id_b): (r.inter, r.uni)
        for r in allpairs_jaccard(sdf, 3, 5).collect()
    }
    assert got == _brute(sets, 3, 5)


def test_prefix_join_actually_prunes(spark):
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(200)]
    sets = {i: set(rng.sample(vocab, 10)) for i in range(80)}
    rows = [(i, t) for i, ts in sets.items() for t in ts]
    sdf = spark.createDataFrame(rows, "doc_id long, term string")
    # reconstruct candidate count the operator would verify
    from pyspark.sql import Window

    s = sdf.distinct()
    sizes = s.groupBy("doc_id").agg(F.count("*").alias("n"))
    dfreq = s.groupBy("term").agg(F.count("*").alias("df"))
    ranked = s.join(dfreq, "term").join(sizes, "doc_id")
    w = Window.partitionBy("doc_id").orderBy("df", "term")
    plen = F.col("n") - F.floor((3 * F.col("n") + 4) / 5) + 1
    prefix = ranked.withColumn("pos", F.row_number().over(w)).where(F.col("pos") <= plen)
    a = prefix.select(F.col("doc_id").alias("ia"), "term")
    b = prefix.select(F.col("doc_id").alias("ib"), "term")
    n_cand = a.join(b, "term").where(F.col("ia") < F.col("ib")).select("ia", "ib").distinct().count()
    assert n_cand < 80 * 79 / 2 * 0.25  # way below all-pairs
    # and the survivors still match brute force
    got = {(r.id_a, r.id_b) for r in allpairs_jaccard(sdf, 3, 5).collect()}
    assert got == set(_brute(sets, 3, 5))


def test_shingle_sets_and_threshold_edge(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),          # shingles {abc, bcd, cde}
            (2, "a b c d e"),          # identical -> J=1
            (3, "a b c x y"),          # shares only abc -> J=1/5
        ],
        "doc_id long, text string",
    )
    sets = doc_term_sets(docs, shingle=3)
    got = {(r.id_a, r.id_b): r.jac for r in allpairs_jaccard(sets, 3, 5).collect()}
    assert got == {(1, 2): 1.0}
    # lowering the threshold to 1/5 admits the weak pair exactly at t
    got2 = {(r.id_a, r.id_b) for r in allpairs_jaccard(sets, 1, 5).collect()}
    assert got2 == {(1, 2), (1, 3), (2, 3)}


def test_single_link_nesting_invariant(spark):
    from spanluke_spark.textops.allpairs import single_link_clusters

    rng = random.Random(3)
    vocab = [f"t{i}" for i in range(25)]
    sets = {i: set(rng.sample(vocab, 8)) for i in range(40)}
    rows = [(i, t) for i, ts in sets.items() for t in ts]
    sdf = spark.createDataFrame(rows, "doc_id long, term string")
    out = single_link_clusters(sdf, [(3, 5), (1, 5)]).collect()
    assert len(out) == 40
    # a higher-threshold cluster never splits across lower-threshold ones
    low_of_high = {}
    for r in out:
        prev = low_of_high.setdefault(r.cluster_3_5, r.cluster_1_5)
        assert prev == r.cluster_1_5
    # cluster ids are member min ids
    for r in out:
        assert r.cluster_3_5 <= r.doc_id and r.cluster_1_5 <= r.doc_id
