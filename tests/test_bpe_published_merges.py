"""Published-tokenizer parity (VERDICT r3 action item 3).

tests/fixtures/gpt2_merges_head.txt is a transcription of the first 25 ranks
of the PUBLIC GPT-2 ``merges.txt`` (the file RobertaTokenizerFast /
GPT2TokenizerFast load; the rank order equals the published vocab.json id
order: id 256+"Ġt", 257 "Ġa", 258 "he", ... — byte-level vocab = 256 byte
tokens followed by one token per merge, in rank order), including its
``#version: 0.2`` header line.

Expected token sequences below were derived BY HAND from that table with the
standard lowest-rank-first BPE loop — independently of this repo's
implementation — so the test pins ``load_merges`` + the tokenizer against the
published file format and merge-order semantics, not against itself. Inputs
stick to ASCII words/digits/single-space/punct-runs where the repo's
documented ASCII pre-tokenizer subset (etl/bpe.py PRETOKEN_RE) agrees exactly
with GPT-2's full pattern (no contractions, no multi-space runs, no
non-ASCII).
"""

import os

from spanluke_spark.etl.bpe import bpe_tokenize, load_merges, merge_ranks, py_tokenize

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "gpt2_merges_head.txt")

# (text, expected byte-level BPE tokens under the 25-rank published prefix)
CASES = [
    # " theatre": Ġt(0) -> he(2) -> re(4) -> Ġt+he(6) -> at(9)
    ("the theatre", ["t", "he", "Ġthe", "at", "re"]),
    (" sitting out", ["Ġs", "it", "t", "ing", "Ġo", "u", "t"]),
    (
        "Batter was 1990, he said.",
        ["B", "at", "t", "er", "Ġw", "a", "s", "Ġ", "1", "9", "9", "0", ",",
         "Ġ", "he", "Ġs", "a", "i", "d", "."],
    ),
    (" cats eat fish", ["Ġc", "at", "s", "Ġ", "e", "at", "Ġf", "is", "h"]),
    (" presenting", ["Ġp", "re", "s", "en", "t", "ing"]),
    (" on that", ["Ġ", "on", "Ġt", "h", "at"]),
]


def test_header_and_rank_count():
    merges = load_merges(FIXTURE)
    assert len(merges) == 25  # header skipped, every rank kept
    assert merges[0] == ("Ġ", "t") and merges[6] == ("Ġt", "he")
    assert merges[24] == ("o", "u")


def test_hand_derived_tokenizations_driver():
    ranks = merge_ranks(load_merges(FIXTURE))
    for text, expected in CASES:
        assert py_tokenize(text, ranks) == expected, text


def test_hand_derived_tokenizations_spark(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(CASES)], "id int, text string"
    ).repartition(3)
    out = bpe_tokenize(df, ["id"], merges_path=FIXTURE)
    got: dict[int, list] = {}
    for r in out.orderBy("id", "word_id", "token_id").collect():
        got.setdefault(r.id, []).append(r.token)
    for i, (text, expected) in enumerate(CASES):
        assert got[i] == expected, text
