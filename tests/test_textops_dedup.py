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
