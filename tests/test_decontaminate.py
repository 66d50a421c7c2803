"""Benchmark decontamination (textops/decontaminate.py): flag counts vs
the pure-Python oracle, removal policy, broadcast plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spanluke_spark.textops.decontaminate import (
    benchmark_ngrams,
    decontaminate,
    flag_contaminated,
    py_ngram_overlap,
)


def _corpus(spark, n=5):
    """Docs 0 and 2 embed verbatim benchmark passages; doc 4 is shorter
    than the n-gram window; the rest are clean."""
    bench_passage = "the quick brown fox jumps over the lazy dog near the river bank today"
    bench2 = "courts interpret statutes according to their plain meaning whenever the text is clear enough"
    docs = [
        (0, f"intro text here {bench_passage} trailing content words beyond"),
        (1, " ".join(f"clean{i}" for i in range(40))),
        (2, f"{bench2} and then some extra commentary follows this passage here"),
        (3, " ".join(f"other{i}" for i in range(30))),
        (4, "too short for any n gram"),
    ]
    bench = [(100, bench_passage), (101, bench2)]
    return (
        spark.createDataFrame(docs, "doc_id long, text string"),
        spark.createDataFrame(bench, "doc_id long, text string"),
        docs,
        [t for _, t in bench],
    )


def test_flags_match_python_oracle(spark):
    docs_df, bench_df, docs, bench_texts = _corpus(spark)
    flagged = flag_contaminated(docs_df, benchmark_ngrams(bench_df))
    got = {r.doc_id: (r.n_hits, r.contaminated) for r in flagged.collect()}
    for doc_id, text in docs:
        want = py_ngram_overlap(text, bench_texts)
        assert got[doc_id] == (want, want > 0), doc_id
    assert got[0][1] and got[2][1]          # embedders flagged
    assert not any(got[i][1] for i in (1, 3, 4))  # clean + too-short pass


def test_decontaminate_removes_only_contaminated(spark):
    docs_df, bench_df, *_ = _corpus(spark)
    kept = decontaminate(docs_df, bench_df)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 4]
    assert kept.columns == docs_df.columns  # flags don't leak into output


def test_ngram_window_sensitivity(spark):
    """With n larger than the longest shared run, nothing is flagged."""
    docs_df, bench_df, *_ = _corpus(spark)
    kept = decontaminate(docs_df, bench_df, n=20)
    assert kept.count() == docs_df.count()


def test_plan_probe_is_broadcast(spark):
    """The corpus side must probe the benchmark set with a BROADCAST join —
    a shuffled probe would reshuffle every corpus n-gram at 10^12 docs."""
    docs_df, bench_df, *_ = _corpus(spark)
    plan = (
        flag_contaminated(docs_df, benchmark_ngrams(bench_df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_curate_composes_decontamination(spark):
    """curate(benchmark=...) drops eval-overlapping docs BEFORE dedup so a
    contaminated doc cannot win a near-dup cluster over clean copies."""
    from spanluke_spark.textops.curate import curate

    passage = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            # doc 0 is a near-copy of doc 1 with a SMALLER id (would win
            # dedup) but embeds the benchmark passage — must be removed
            # first so the clean doc 1 survives
            (0, passage + " tail0 " + " ".join(f"c{i}" for i in range(15))),
            (1, " ".join(f"c{i}" for i in range(15)) + " unique middle " * 3),
            (2, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, passage)], "doc_id long, text string")
    kept = curate(docs, dedup_threshold=None, benchmark=bench)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    # without the benchmark, nothing is removed
    assert curate(docs, dedup_threshold=None).count() == 3


def test_normalization_catches_reformatted_text(spark):
    """GPT-3 appendix-C policy: lowercase + punctuation strip before the
    overlap, so a benchmark passage that was re-cased and re-punctuated in
    the training corpus is still flagged."""
    passage = " ".join(f"w{i}" for i in range(13))
    reformatted = "W0, w1; W2! w3 w4 (w5) w6 — w7 W8 w9 w10 “w11” w12."
    docs_df = spark.createDataFrame(
        [(0, f"prefix {reformatted} suffix"), (1, " ".join(f"c{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    bench_df = spark.createDataFrame([(9, passage)], "doc_id long, text string")
    kept = decontaminate(docs_df, bench_df)
    assert sorted(r.doc_id for r in kept.collect()) == [1]
    # exact-token mode (normalize=False) documents the old behavior: misses it
    kept_raw = decontaminate(docs_df, bench_df, normalize=False)
    assert sorted(r.doc_id for r in kept_raw.collect()) == [0, 1]


def test_normalizer_python_spark_parity(spark):
    """The Spark \\p{P}\\p{S} regex and the unicodedata P*/S* oracle agree
    character-for-character on a punctuation-heavy sample."""
    from spanluke_spark.textops.decontaminate import (
        normalize_for_overlap,
        py_normalize_for_overlap,
    )

    samples = [
        "Hello, World! It's 100% — 'quoted' + <tags> & [refs]; $5.00?",
        "café «guillemets» …ellipsis… em—dash en–dash",
        "math: a+b=c; 3<4>2 ~tilde~ |pipe| ^caret^ `tick`",
        "no punctuation here at all",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [r.n for r in df.select(normalize_for_overlap(F.col("t")).alias("n")).collect()]
    assert got == [py_normalize_for_overlap(s) for s in samples]


def test_broadcast_guard_falls_back_to_shuffled_join(spark):
    """With the threshold forced below the fingerprint size, the probe must
    drop the broadcast hint (shuffled left_semi) — and results must be
    identical in both modes."""
    from spanluke_spark.textops.decontaminate import benchmark_ngrams

    docs_df, bench_df, *_ = _corpus(spark)
    grams = benchmark_ngrams(bench_df)
    n_grams = grams.count()
    assert n_grams > 2

    def plan(max_bc):
        return (
            flag_contaminated(docs_df, grams, max_broadcast_grams=max_bc)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    assert "BroadcastHashJoin" in plan(n_grams + 10)  # fits -> broadcast
    over = plan(2)  # forced low -> shuffled fallback
    assert "BroadcastHashJoin" not in over and "LeftSemi" in over
    small = {r._id: r.n_hits for r in
             flag_contaminated(docs_df, grams, max_broadcast_grams=2)
             .select(F.col("doc_id").alias("_id"), "n_hits").collect()}
    big = {r._id: r.n_hits for r in
           flag_contaminated(docs_df, grams, max_broadcast_grams=None)
           .select(F.col("doc_id").alias("_id"), "n_hits").collect()}
    assert small == big
