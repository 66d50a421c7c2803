"""Byte-level BPE: merge-order parity, round-trip, Spark==Python, alignment.

Pins the three-way agreement the q37 oracle relies on: the priority-loop
tokenizer (py_bpe), the rank-order sequential formulation (what DuckDB
replays as a replace() chain), and the Spark mapInPandas path.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spanluke_spark.etl.bpe import (
    bpe_token_count,
    bpe_tokenize,
    align_labels_bpe,
    detokenize,
    from_unicode,
    load_merges,
    merge_ranks,
    py_bpe,
    py_pretokenize,
    py_tokenize,
    to_unicode,
    train_bpe_merges,
)

SF_DIR = "/root/testdata/sf0.001"


def _corpus_texts(limit=80):
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id LIMIT {limit}"
        ).fetchall()
    ]


def _seq_bpe(u: str, merges) -> list[str]:
    """Rank-order sequential application — the oracle's formulation."""
    syms = list(u)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_sequential_equals_priority_on_corpus():
    merges = load_merges()
    ranks = merge_ranks(merges)
    n = 0
    for t in _corpus_texts():
        for pt in py_pretokenize(t):
            u = to_unicode(pt)
            assert py_bpe(u, ranks) == _seq_bpe(u, merges), pt
            n += 1
    assert n > 500


def test_roundtrip_detokenization():
    ranks = merge_ranks()
    for t in _corpus_texts(20) + ["", "a", "  spaced  out ", "mix3d 42 w0rds!?"]:
        toks = py_tokenize(t, ranks)
        assert detokenize(toks) == t
        # ASCII-only corpus: per-token decode agrees with the stream decode
        assert "".join(from_unicode(x) for x in toks) == t


def test_training_is_deterministic_and_matches_frozen_file():
    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet' ORDER BY doc_id"
        ).fetchall()
    ]
    assert train_bpe_merges(texts, num_merges=200) == list(load_merges())


def test_spark_tokenize_matches_python(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    got = {}
    for r in bpe_tokenize(docs, ["doc_id"]).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["token_id"], r["word_id"], r["token"], r["is_first"])
        )
    ranks = merge_ranks()
    for r in docs.collect():
        exp = []
        tid = 0
        for wid, pt in enumerate(py_pretokenize(r["text"])):
            for j, tok in enumerate(py_bpe(to_unicode(pt), ranks)):
                exp.append((tid, wid, tok, j == 0))
                tid += 1
        assert sorted(got.get(r["doc_id"], [])) == exp, r["doc_id"]


def test_token_count_column_matches_python(spark):
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    ranks = merge_ranks()
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_count(docs).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == len(py_tokenize(r["text"], ranks))


def test_first_subtoken_alignment(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    toks = bpe_tokenize(docs, ["doc_id"])
    # word-level labels: word 0 -> 7, word 1 -> 9
    labels = spark.createDataFrame(
        [(1, 0, 7), (1, 1, 9)], "doc_id long, word_id int, label_id int"
    )
    strict = align_labels_bpe(toks, labels, ["doc_id"], label_all_tokens=False)
    rows = sorted(
        (r["token_id"], r["is_first"], r["label_id"]) for r in strict.collect()
    )
    # exactly one first subtoken per word carries the label; others -100
    firsts = [lab for _, is_first, lab in rows if is_first]
    conts = [lab for _, is_first, lab in rows if not is_first]
    assert sorted(firsts) == [7, 9]
    assert all(lab == -100 for lab in conts)
    # label_all_tokens=True: every subtoken of word 0 gets 7, of word 1 gets 9
    all_tok = align_labels_bpe(toks, labels, ["doc_id"], label_all_tokens=True)
    for r in all_tok.collect():
        assert r["label_id"] == (7 if r["word_id"] == 0 else 9)


def test_load_merges_accepts_hf_format(tmp_path):
    """The published GPT-2/HF merges.txt format (space-separated pairs,
    #version header) loads identically to the repo's tab format."""
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nĠ s\ne r\nĠa b\n", encoding="utf-8")
    assert load_merges(str(p)) == (("Ġ", "s"), ("e", "r"), ("Ġa", "b"))


def test_roundtrip_arbitrary_unicode_hypothesis():
    """Byte-level alphabet covers ALL of UTF-8: any text round-trips through
    tokenize/detokenize exactly, including non-ASCII (which the ASCII
    pre-tokenizer lumps into punct-runs — still lossless)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ranks = merge_ranks()

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=80))
    def check(t):
        toks = py_tokenize(t, ranks)
        assert detokenize(toks) == t
        # pretokens partition the text exactly
        assert "".join(py_pretokenize(t)) == t

    check()


def test_byte_unicode_bijection():
    b2u = __import__(
        "spanluke_spark.etl.bpe", fromlist=["bytes_to_unicode"]
    ).bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert b2u[ord(" ")] == "Ġ" and b2u[ord("\n")] == "Ċ"
    assert b2u[ord("A")] == "A"


def test_cached_bpe_matches_uncached():
    from spanluke_spark.etl.bpe import CachedBPE

    ranks = merge_ranks()
    bpe = CachedBPE(ranks, cap=8)  # tiny cap exercises eviction
    for t in _corpus_texts(30):
        assert bpe.tokenize(t) == py_tokenize(t, ranks)


def test_spark_bpe_training_matches_driver_trainer(spark):
    """Distributed BPE training == the driver-side trainer, bit-identical:
    same greedy pair choice, same lexicographic tie-break, same stop rule."""
    from spanluke_spark.etl.bpe import train_bpe_merges_spark

    texts = _corpus_texts(120)
    expected = train_bpe_merges(texts, num_merges=30)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe_merges_spark(df, num_merges=30)
    assert got == expected[: len(got)] and len(got) == 30


def test_spark_bpe_training_small_corpus_to_exhaustion(spark):
    from spanluke_spark.etl.bpe import train_bpe_merges_spark

    texts = ["low lower lowest low low", "new newer newest new newer"]
    expected = train_bpe_merges(texts, num_merges=50)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = train_bpe_merges_spark(df, num_merges=50)
    assert got == expected  # both stop at the same min-count boundary


def test_spark_bpe_batched_trainer_round_count(spark):
    """The batched trainer learns the fixture vocabulary in FAR fewer
    driver round-trips than one-merge-per-job (r3 'What's wrong' item 1),
    while staying bit-identical to the sequential driver trainer (asserted
    by test_spark_bpe_training_matches_driver_trainer)."""
    from spanluke_spark.etl.bpe import train_bpe_merges, train_bpe_merges_spark

    texts = [
        "the cat sat on the mat and the dog sat on the log",
        "low lower lowest newer newest wider widest",
        "a batter better butter bitter matters the most",
    ] * 4
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    stats = {}
    got = train_bpe_merges_spark(df, num_merges=40, stats=stats)
    assert got == train_bpe_merges(texts, num_merges=40)
    assert stats["merges"] == len(got)
    assert stats["rounds"] < len(got), stats  # strictly batched, not 1/job


def test_disjoint_batch_guards_produced_strings():
    """The batch cut must treat a candidate touching the CONCATENATION of a
    kept pair (or producing a kept symbol) as interacting: applying the kept
    merge mints new copies of that string, so the later candidate's stale
    rank could understate it. Unreachable from a char-level start in an 8k-
    corpus randomized search, but enforced unconditionally."""
    from spanluke_spark.etl.bpe import _disjoint_merge_batch

    sep = "\x00"
    # candidate 2 contains kept 1's produced string "ab" -> batch must stop
    cands = [(f"a{sep}b", 100), (f"ab{sep}c", 90), (f"d{sep}e", 80)]
    assert _disjoint_merge_batch(cands, sep, 2, truncated=False) == [("a", "b")]
    # candidate 2 PRODUCES kept 1's left symbol "x" (a+b == x) -> stop too
    cands = [(f"xy{sep}z", 100), (f"x{sep}y", 90), (f"d{sep}e", 80)]
    assert _disjoint_merge_batch(cands, sep, 2, truncated=False) == [("xy", "z")]
    # plain disjoint candidates still batch together
    cands = [(f"a{sep}b", 100), (f"c{sep}d", 90), (f"e{sep}f", 80)]
    assert _disjoint_merge_batch(cands, sep, 2, truncated=False) == [
        ("a", "b"), ("c", "d"), ("e", "f"),
    ]
