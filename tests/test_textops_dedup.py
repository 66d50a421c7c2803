"""Text-analysis + dedup operator tests (training-data pipeline ops)."""

import pytest
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from spanluke_spark.textops.quality import (
    bpe_ish_token_count,
    fingerprint,
    lang_scores,
    quality_features,
    token_count,
)


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! THE end."), (2, ""), (3, "   "), (4, "one")],
        "id long, text string",
    )
    got = {r.id: r for r in quality_features(df).collect()}
    assert got[1].n_tokens == 4
    assert got[2].n_tokens == 0 and got[3].n_tokens == 0
    assert got[4].n_tokens == 1
    assert got[1].punct_ratio > 0 and got[1].upper_ratio > 0
    assert got[2].punct_ratio == 0.0

    bpe = {r.id: r.n_bpe_tokens for r in bpe_ish_token_count(df).collect()}
    # Hello , World ! THE end . -> 7
    assert bpe[1] == 7 and bpe[2] == 0


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der Hund und die Katze ist da"),
            (3, "le chat et la maison des les"),
        ],
        "id long, text string",
    )
    got = {r.id: r.lang_guess for r in lang_scores(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a"), (4, "")],
        "id long, text string",
    )
    got = {r.id: r.fingerprint for r in fingerprint(df, ["id"]).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert got[4] == 0


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "A  b"), (2, "a b"), (3, "different"), (4, "a B ")],
        "doc_id long, text string",
    )
    got = {tuple(r.members): r for r in exact_dedup(df).collect()}
    assert got[(1, 2, 4)].canonical_id == 1 and got[(1, 2, 4)].n_copies == 3
    assert got[(3,)].n_copies == 1


def test_word_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "id long, text string")
    got = {r.id: r.sh for r in df.select("id", word_shingles(F.col("text"), 3).alias("sh")).collect()}
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # shorter than n


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(df, threshold=0.5).collect()}
    assert (1, 2) in got and 0.5 <= got[(1, 2)] < 1.0
    assert all(p == (1, 2) for p in got)


def test_minhash_lsh_properties(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    # plant exact + near duplicates
    dup = docs.limit(5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = docs.limit(5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tiny tail suffix")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    all_docs = docs.unionByName(dup).unionByName(near)
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(all_docs, verify_threshold=0.5).collect()
    }
    # every exact duplicate pair MUST collide in all bands and verify at 1.0
    for d in range(5):
        base = d  # doc_ids are 0..4 for the first five
        assert (base, base + 100000) in pairs, (base, sorted(pairs)[:5])
        assert pairs[(base, base + 100000)] == 1.0
    # near-dups (one shingle tail changed) should be found with high jaccard
    found_near = [p for p in pairs if p[1] >= 200000 and p[0] == p[1] - 200000]
    assert len(found_near) >= 4
    # no false positives beyond verification threshold by construction
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash_similarity(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and AGAIN"),
            (3, "entirely unrelated content about database query optimizers"),
        ],
        "doc_id long, text string",
    )
    sh = simhash(df)
    rows = {r.id: r.simhash for r in sh.collect()}
    a = sh.alias("a").crossJoin(sh.alias("b")).select(
        F.col("a.id").alias("ia"),
        F.col("b.id").alias("ib"),
        hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("d"),
    )
    d = {(r.ia, r.ib): r.d for r in a.collect()}
    assert d[(1, 1)] == 0
    assert d[(1, 2)] < d[(1, 3)]  # near-dup closer than unrelated
    assert d[(1, 2)] <= 16
    assert rows[1] >= 0  # stays in signed-long range


def test_embedding_neardup(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(60)
    dup = emb.limit(3).select((F.col("vec_id") + 5000).alias("vec_id"), "embedding", "label")
    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_neardup_pairs(emb.unionByName(dup), threshold=0.999).collect()
    }
    for v in range(3):
        assert (v, v + 5000) in pairs or (v + 5000, v) in pairs


def test_ngram_jaccard_hot_shingle_cap(spark):
    """A stop-phrase shingle shared by every doc must not blow up the
    candidate pair count: with max_df it is dropped from the universe, and
    the Jaccard is exact over the retained shingle space."""
    # every doc shares the hot shingle "x y z"; docs 1 and 2 share 3 more
    common = "x y z"
    rows = [(1, f"{common} a b c d e"), (2, f"{common} a b c d q")] + [
        (i, f"{common} u{i} v{i} w{i}") for i in range(3, 40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_df=5)
    got = {(r.id_a, r.id_b): r for r in capped.collect()}
    # without the cap, every one of the 39*38/2 pairs is a candidate via the
    # hot shingle; with it, only (1,2) survives blocking at all
    assert set(got) == {(1, 2)}
    # retained universes: doc1 {a b c, b c d, c d e}-ish minus hot-shingle
    # prefix overlaps -- compute exactly in python
    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    s1, s2 = shingles(rows[0][1]), shingles(rows[1][1])
    hot = {s for s in s1 | s2 if s in shingles(rows[2][1])}  # shingles in >5 docs
    # df of shingles containing the common prefix: appear in all 39 docs only
    # for "x y z"; mixed ones ("y z a") appear in 2 docs (1 and 2) -> retained
    all_sh = {}
    for _, t in rows:
        for s in shingles(t):
            all_sh[s] = all_sh.get(s, 0) + 1
    keep1 = {s for s in s1 if all_sh[s] <= 5}
    keep2 = {s for s in s2 if all_sh[s] <= 5}
    inter = keep1 & keep2
    want_j = len(inter) / len(keep1 | keep2)
    r = got[(1, 2)]
    assert r.n_common == len(inter)
    assert abs(r.jaccard - want_j) < 1e-12


def test_embedding_neardup_auto_switches_to_lsh(spark):
    """method='auto' uses brute under the limit and LSH above it; on planted
    exact duplicates both paths find the pairs (identical vectors collide in
    every LSH band)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(30, 64).astype("float32")
    rows = [(i, base[i].tolist()) for i in range(30)]
    rows += [(100 + i, base[i].tolist()) for i in range(5)]  # planted dups
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planted = {(i, 100 + i) for i in range(5)}

    brute = embedding_neardup_pairs(emb, threshold=0.999, method="brute")
    got_b = {(r.id_a, r.id_b) for r in brute.collect()}
    assert planted <= got_b

    lsh = embedding_neardup_pairs(emb, threshold=0.999, method="lsh")
    got_l = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert planted <= got_l

    auto_small = embedding_neardup_pairs(emb, threshold=0.999, method="auto", brute_limit=10)
    assert planted <= {(r.id_a, r.id_b) for r in auto_small.collect()}


def test_lsh_threshold_pairs_dim_safety(spark):
    """Non-64-dim embeddings must not silently degenerate LSH into a single
    bucket (ADVICE: zip_with null-padding bug): with 32-dim inputs, distinct
    directions still land in >1 distinct bucket per band."""
    import numpy as np

    from spanluke_spark.link.ann import hyperplane_signature

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(32).astype("float32").tolist()) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    sig = hyperplane_signature(emb, "vec_id", "embedding", "a")
    n_buckets = sig.select("band", "bucket").distinct().groupBy("band").count().collect()
    assert all(r["count"] > 1 for r in n_buckets)


def test_exact_dedup_by_hash_equals_text_mode(spark, sf_dir):
    """Scale mode (16-byte shuffle key) must produce the identical dedup
    result as full-text grouping on real data."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = {(r.canonical_id, r.n_copies, tuple(r.members)) for r in exact_dedup(docs).collect()}
    b = {
        (r.canonical_id, r.n_copies, tuple(r.members))
        for r in exact_dedup(docs, by_hash=True).collect()
    }
    assert a == b and len(a) > 0


def test_simhash_neardup_pairs_equals_bruteforce(spark):
    """Pigeonhole-banded Hamming search == brute-force all-pairs XOR: the
    blocking may not drop any true pair (k diffs can't touch k+1 bands) and
    the verify filter kills every false positive."""
    from spanluke_spark.dedup.dedup import simhash, simhash_neardup_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(40):
        words = base.split()
        # small perturbations -> clusters of close fingerprints
        if i % 4 == 1:
            words[i % len(words)] = f"x{i}"
        elif i % 4 == 2:
            words = words + [f"extra{i % 3}"]
        elif i % 4 == 3:
            words = words[1:]
        rows.append((i, " ".join(words)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    K = 6
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in simhash_neardup_pairs(df, max_distance=K).collect()
    )
    fps = {r["id"]: r["simhash"] for r in simhash(df).collect()}
    want = sorted(
        (i, j, bin((fps[i] ^ fps[j]) & ((1 << 63) - 1)).count("1"))
        for i in fps
        for j in fps
        if i < j and bin((fps[i] ^ fps[j]) & ((1 << 63) - 1)).count("1") <= K
    )
    assert got == want and len(want) > 0


def test_exact_dedup_member_cap_bounds_hot_key(spark):
    """A 10^5-copy key (the OOM input) must produce a bounded members array
    with the true n_copies, identical canonical survivor, and the smallest
    max_members ids — and the capped plan must still be a single exchange."""
    hot = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate page").alias("text")
    )
    rest = spark.createDataFrame(
        [(200_000, "unique a"), (200_001, "unique b"), (200_002, "unique a")],
        "doc_id long, text string",
    )
    df = hot.union(rest)
    out = {r.canonical_id: r for r in exact_dedup(df, by_hash=True).collect()}
    assert out[0].n_copies == 100_000
    assert len(out[0].members) == 100 and out[0].members == list(range(100))
    assert out[200_000].members == [200_000, 200_002]
    plan = exact_dedup(df, by_hash=True)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    # uncapped mode still available and exact on small groups
    full = {r.canonical_id: r for r in exact_dedup(rest, max_members=None).collect()}
    assert full[200_000].members == [200_000, 200_002]


def test_exact_dedup_cap_matches_uncapped_below_cap(spark):
    """Below the cap, capped and uncapped modes are bit-identical."""
    rows = [(i, f"text {i % 7}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = sorted(map(tuple, exact_dedup(df).collect()))
    uncapped = sorted(map(tuple, exact_dedup(df, max_members=None).collect()))
    assert capped == uncapped
