"""WordPiece tokenization + label alignment (J3/P3/P4) vs a pure-Python
mirror of the reference's tokenize_and_align_labels
(legal_ner/utils/dataset.py:163-189) and the inference-side special-token
strip (inference.py:36-43)."""

from pyspark.sql import functions as F

from spanluke_spark.etl.wordpiece import (
    CLS,
    IGNORE_INDEX,
    SEP,
    drop_ignored,
    first_subtokens,
    py_wordpiece,
    strip_special_tokens,
    tokenize_and_align_labels,
    wordpiece_rows,
)
from spanluke_spark.fixtures import WORDPIECE_VOCAB

VOCAB = set(WORDPIECE_VOCAB)


def _py_align(sentences, label_all_tokens=True):
    """Reference-semantics mirror: word_ids() is None for specials -> -100;
    first subtoken of a word -> its label; continuations -> label (the
    reference's effective behavior) or -100 (first-only rule)."""
    out = []
    for sid, words in sentences:
        toks = [(CLS, None, IGNORE_INDEX)]
        for wid, (w, lab) in enumerate(words):
            for si, piece in enumerate(py_wordpiece(w, VOCAB)):
                tok = piece if si == 0 else "##" + piece
                if si == 0:
                    toks.append((tok, wid, lab))
                else:
                    toks.append((tok, wid, lab if label_all_tokens else IGNORE_INDEX))
        toks.append((SEP, None, IGNORE_INDEX))
        for pos, (tok, wid, lab) in enumerate(toks):
            out.append((sid, pos, tok, wid, lab))
    return sorted(out)


SENTS = [
    ("s1", [("Spark", 3), ("aggregation", 0), ("window", 5)]),
    ("s2", [("customer", 7), ("zq", 0)]),
]


def _words_df(spark):
    rows = [
        (sid, wid, w, lab)
        for sid, words in SENTS
        for wid, (w, lab) in enumerate(words)
    ]
    return spark.createDataFrame(rows, "sent_id string, word_id int, word string, label_id int")


def test_align_parity_label_all_tokens(spark):
    got = sorted(
        (r.sent_id, r.token_pos, r.token, r.word_id, r.label_id)
        for r in tokenize_and_align_labels(_words_df(spark), WORDPIECE_VOCAB).collect()
    )
    assert got == _py_align(SENTS, label_all_tokens=True)


def test_align_parity_first_only(spark):
    got = sorted(
        (r.sent_id, r.token_pos, r.token, r.word_id, r.label_id)
        for r in tokenize_and_align_labels(
            _words_df(spark), WORDPIECE_VOCAB, label_all_tokens=False
        ).collect()
    )
    assert got == _py_align(SENTS, label_all_tokens=False)


def test_special_and_ignore_filters(spark):
    toks = tokenize_and_align_labels(_words_df(spark), WORDPIECE_VOCAB, label_all_tokens=False)
    toks.persist()
    stripped = strip_special_tokens(toks)
    # P3: exactly 2 specials per sentence removed; none remain
    assert toks.count() - stripped.count() == 2 * len(SENTS)
    assert stripped.filter(F.col("token").isin(CLS, SEP)).count() == 0
    # specials carry NULL word_id (word_ids() None) and -100
    specials = toks.filter(F.col("token").isin(CLS, SEP))
    assert specials.filter(F.col("word_id").isNotNull()).count() == 0
    assert specials.filter(F.col("label_id") != IGNORE_INDEX).count() == 0
    # P4: after drop_ignored, one labeled token per WORD (first-only rule)
    kept = drop_ignored(stripped)
    n_words = sum(len(ws) for _, ws in SENTS)
    assert kept.count() == n_words
    toks.unpersist()


def test_wordpiece_rows_reassemble(spark):
    """J3 round-trip: concatenating a word's subtokens (## stripped)
    reproduces the lowercased word; first_subtokens keeps one row per word."""
    docs = spark.createDataFrame(
        [(1, "Spark aggregation window"), (2, "customer data zq")], "doc_id int, text string"
    )
    sub = wordpiece_rows(docs, ["doc_id"], WORDPIECE_VOCAB)
    rejoined = (
        sub.withColumn("piece", F.regexp_replace("subtoken", "^##", ""))
        .groupBy("doc_id", "word_id", "word")
        .agg(F.concat_ws("", F.sort_array(F.collect_list(F.struct("sub_idx", "piece"))).getField("piece")).alias("glued"))
    )
    bad = rejoined.filter(F.col("glued") != F.lower("word")).count()
    assert bad == 0
    firsts = first_subtokens(sub)
    assert firsts.count() == sub.select("doc_id", "word_id").distinct().count()
