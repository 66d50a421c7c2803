"""J3/P3/P4: deterministic WordPiece-style subword tokenization + label
alignment — the real (non-synthetic) analog of the reference's
``tokenize_and_align_labels`` (legal_ner/utils/dataset.py:163-189) and the
special-token strip at inference (legal_ner/inference.py:36-43, the
``[1:-1]`` on offset_mapping / predictions).

No HF tokenizers exist in this sandbox, so the tokenizer itself is a small
deterministic greedy longest-match over a corpus-derived vocabulary:

- units are lowercase substrings of length 1..MAX_UNIT_LEN (single chars are
  implicit fallback, so every word tokenizes);
- at each position the longest vocab unit wins (4, then 3, then 2, else 1) —
  position-independent matching, which keeps the algorithm exactly
  replayable in SQL (the q35 oracle is a recursive CTE over the same
  vocabulary, so Spark and DuckDB produce identical splits);
- continuation pieces are rendered ``##unit`` like WordPiece.

Alignment semantics mirror dataset.py:163-189 exactly:
- special tokens ([CLS]/[SEP]) get label −100 (ignored in the loss);
- the first subtoken of each word gets the word's label;
- continuation subtokens get the word label when ``label_all_tokens=True``
  (the reference's effective behavior — its else-branch appends
  ``label[word_idx]``) or −100 when False (the first-subtoken-only rule).

Operators delivered here: J3 (wordpiece→word join via word_id), P3
(special-token filter), P4 (ignore-index −100 filter).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_UNIT_LEN = 4
IGNORE_INDEX = -100
CLS, SEP = "[CLS]", "[SEP]"


def py_wordpiece(word: str, vocab: set[str], max_len: int = MAX_UNIT_LEN) -> list[str]:
    """Greedy longest-match split of ``word`` (lowercased) into units.
    Single characters always match (implicit vocab) — no [UNK]."""
    w = word.lower()
    out: list[str] = []
    i, n = 0, len(w)
    while i < n:
        ln = min(max_len, n - i)
        while ln > 1 and w[i : i + ln] not in vocab:
            ln -= 1
        out.append(w[i : i + ln])
        i += ln
    return out


def build_wordpiece_vocab(
    df: DataFrame, text_col: str = "text", top_k: int = 60, max_len: int = MAX_UNIT_LEN
) -> list[str]:
    """Corpus-driven vocabulary: the ``top_k`` most frequent lowercase
    substrings of each length 2..max_len over whitespace words (ties break
    lexicographically — fully deterministic). One distributed aggregation
    per length; the result is small enough to freeze as a fixture, the
    moral equivalent of shipping a trained tokenizer."""
    words = df.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w")
    )
    vocab: list[str] = []
    for ln in range(2, max_len + 1):
        # all substrings of length ln, relationally (sequence is descending
        # when stop < start, so guard short words with an empty array)
        starts = F.when(
            F.length("w") >= ln, F.sequence(F.lit(1), F.length("w") - ln + 1)
        ).otherwise(F.array().cast("array<int>"))
        subs = words.select(
            F.explode(F.transform(starts, lambda i: F.col("w").substr(i, F.lit(ln)))).alias("u")
        )
        top = (
            subs.groupBy("u")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), "u")
            .limit(top_k)
        )
        vocab.extend(r.u for r in top.collect())
    return sorted(vocab)


def wordpiece_rows(
    df: DataFrame,
    id_cols: list[str],
    vocab: list[str] | set[str],
    text_col: str = "text",
) -> DataFrame:
    """Explode documents into subword rows:
    (id_cols..., word_id, word, sub_idx, subtoken) — subtoken carries the
    ``##`` continuation marker. One Arrow hop; the greedy loop is per-word
    Python (sequential by construction), everything after is relational."""
    vocab_set = set(vocab)
    out_schema = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols]
        + ["word_id int", "word string", "sub_idx int", "subtoken string"]
    )

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in pdf.columns if c != text_col}
            rows.update({"word_id": [], "word": [], "sub_idx": [], "subtoken": []})
            for rec in pdf.itertuples(index=False):
                rec_d = rec._asdict()
                text = rec_d.get(text_col) or ""
                for wid, w in enumerate(text.split()):
                    pieces = py_wordpiece(w, vocab_set)
                    for si, piece in enumerate(pieces):
                        for c in rows:
                            if c in rec_d and c not in (
                                "word_id",
                                "word",
                                "sub_idx",
                                "subtoken",
                            ):
                                rows[c].append(rec_d[c])
                        rows["word_id"].append(wid)
                        rows["word"].append(w)
                        rows["sub_idx"].append(si)
                        rows["subtoken"].append(piece if si == 0 else "##" + piece)
            yield pd.DataFrame(rows)

    return df.select(*id_cols, text_col).mapInPandas(_gen, out_schema)


def tokenize_and_align_labels(
    words: DataFrame,
    vocab: list[str] | set[str],
    sent_col: str = "sent_id",
    word_idx_col: str = "word_id",
    word_col: str = "word",
    label_col: str = "label_id",
    label_all_tokens: bool = True,
) -> DataFrame:
    """dataset.py:163-189 as a DataFrame op. Input: one row per word with an
    integer label. Output: one row per model token —
    (sent_id, token_pos, token, word_id nullable, label_id) including [CLS]
    at pos 0 and [SEP] at the end, both labeled −100 with NULL word_id
    (word_ids() is None for specials)."""
    vocab_set = set(vocab)
    sent_t = words.schema[sent_col].dataType.simpleString()
    out_schema = (
        f"`{sent_col}` {sent_t}, token_pos int, token string, "
        "word_id int, label_id int"
    )

    def _sentence(pdf: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas: the whole sentence arrives in one frame (a
        # mapInPandas batch could split a sentence across partitions).
        cols: dict[str, list] = {
            sent_col: [],
            "token_pos": [],
            "token": [],
            "word_id": [],
            "label_id": [],
        }
        grp = pdf.sort_values(word_idx_col)
        sid = grp[sent_col].iloc[0]
        toks: list[tuple[str, int | None, int]] = [(CLS, None, IGNORE_INDEX)]
        for rec in grp.itertuples(index=False):
            rd = rec._asdict()
            wid, w, lab = int(rd[word_idx_col]), rd[word_col], int(rd[label_col])
            for si, piece in enumerate(py_wordpiece(w, vocab_set)):
                tok = piece if si == 0 else "##" + piece
                if si == 0:
                    toks.append((tok, wid, lab))
                else:
                    toks.append((tok, wid, lab if label_all_tokens else IGNORE_INDEX))
        toks.append((SEP, None, IGNORE_INDEX))
        for pos, (tok, wid, lab) in enumerate(toks):
            cols[sent_col].append(sid)
            cols["token_pos"].append(pos)
            cols["token"].append(tok)
            cols["word_id"].append(wid)
            cols["label_id"].append(lab)
        out = pd.DataFrame(cols)
        out["word_id"] = out["word_id"].astype("Int32")
        return out

    return (
        words.select(sent_col, word_idx_col, word_col, label_col)
        .groupBy(sent_col)
        .applyInPandas(_sentence, out_schema)
    )


def strip_special_tokens(tokens: DataFrame, token_col: str = "token") -> DataFrame:
    """P3: drop [CLS]/[SEP] rows — the reference's ``[1:-1]`` strip on
    offset_mapping and predictions (inference.py:36-43)."""
    return tokens.filter(~F.col(token_col).isin(CLS, SEP))


def drop_ignored(tokens: DataFrame, label_col: str = "label_id") -> DataFrame:
    """P4: drop ignore-index rows — the −100 mask applied before metric
    computation (main.py:288-302 `if l != -100`)."""
    return tokens.filter(F.col(label_col) != IGNORE_INDEX)


def first_subtokens(subtok: DataFrame) -> DataFrame:
    """J3 helper: keep the first subtoken per word (the first-subtoken
    labeling rule, dataset.py:176-178)."""
    return subtok.filter(F.col("sub_idx") == 0)
