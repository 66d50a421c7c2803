"""Fused mention-extraction pipeline (SURVEY.md §3.1 Spark lifecycle).

The reference's per-document loop (inference.py:153-175) becomes ONE
Arrow-batched Python hop per partition: tokenize -> score -> decode -> mention
rows. No shuffle anywhere in extraction; shuffles first appear at
link/canonicalize/dedupe. Window-function and relational variants of the same
operators live in ner/decode.py + etl/ for oracle checking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .etl.tokenize import py_char_offsets, py_tokenize_words
from .ner.decode import py_adjacent_merge, py_greedy_decode_mentions
from .ner.scorer import Gazetteer, GazetteerTokenScorer, HashedGazetteerSpanScorer
from .ner.spans import ENTITY_MAX_LENGTH, py_enumerate_spans
from .schemas import LEGALNER_ENTITIES, encoding_a, idx_to_label

MENTION_COLS = "sent_id int, start int, end int, surface string, label string, score double"


def _out_schema(df: DataFrame, id_cols: list[str]) -> str:
    ids = ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in id_cols)
    return f"{ids}, {MENTION_COLS}"


def repartition_for_extraction(df: DataFrame, id_cols: list[str], parallelism: int | None) -> DataFrame:
    """Size-balanced partitions for the Python-kernel stage: hash on the doc
    key (north_star: 'salted, size-balanced partitions by xxhash64(url)').
    At cluster scale the input's native ~128MB splits already provide this;
    locally a single small parquet file would otherwise serialize extraction
    onto one core."""
    if parallelism is None:
        return df
    return df.repartition(parallelism, F.xxhash64(*id_cols))


def extract_mentions_token(
    df: DataFrame,
    id_cols: list[str],
    gazetteer: Gazetteer | None,
    text_col: str = "text",
    parallelism: int | None = None,
    scorer_factory=None,
) -> DataFrame:
    """Token-classification path (M1 + W1): per doc, predict a type per token
    (gazetteer surrogate by default), then adjacent-merge into char-span
    mentions — the exact inference.py:35-81 algorithm, distributed.
    ``scorer_factory`` (picklable zero-arg callable returning an object with
    the ``predict_types`` contract — e.g. a trained
    ``lambda: LinearTokenScorer(npz_path)``) swaps the backend; scorer state
    is rebuilt once per Arrow batch iterator (executor-local singleton)."""
    if gazetteer is None and scorer_factory is None:
        raise ValueError("need a gazetteer (surrogate) or a scorer_factory")
    gaz_dict = gazetteer.to_broadcastable() if gazetteer is not None else None
    schema = _out_schema(df, id_cols)
    df = repartition_for_extraction(df, id_cols, parallelism)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = (
            scorer_factory()
            if scorer_factory is not None
            else GazetteerTokenScorer(Gazetteer.from_broadcastable(gaz_dict))
        )
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in id_cols}
            rows.update(
                {"sent_id": [], "start": [], "end": [], "surface": [], "label": [], "score": []}
            )
            # column lists instead of itertuples()._asdict(): the per-row
            # namedtuple + OrderedDict allocations were ~15% of kernel time
            id_vals = [pdf[c].tolist() for c in id_cols]
            for ri, text in enumerate(pdf[text_col].tolist()):
                text = text or ""
                words = py_tokenize_words(text)
                types = scorer.predict_types(words)
                # char offsets lazily, only through the last typed token:
                # zip() inside py_adjacent_merge ignores the truncated
                # trailing "O" tail, so output is identical (r6, guide §4.2)
                last = -1
                for i in range(len(types) - 1, -1, -1):
                    if types[i] != "O":
                        last = i
                        break
                if last < 0:
                    continue
                starts, ends = py_char_offsets(text, words, last + 1)
                for m in py_adjacent_merge(list(zip(starts, ends)), types):
                    for ci, c in enumerate(id_cols):
                        rows[c].append(id_vals[ci][ri])
                    rows["sent_id"].append(0)
                    rows["start"].append(m["start"])
                    rows["end"].append(m["end"])
                    rows["surface"].append(text[m["start"] : m["end"]])
                    rows["label"].append(m["label"])
                    rows["score"].append(1.0)
            yield pd.DataFrame(rows)

    return df.select(*id_cols, text_col).mapInPandas(_extract, schema)


def extract_mentions_span(
    df: DataFrame,
    id_cols: list[str],
    gazetteer: Gazetteer,
    text_col: str = "text",
    entities: list[str] | None = None,
    max_length: int = ENTITY_MAX_LENGTH,
    parallelism: int | None = None,
    scorer_factory=None,
) -> DataFrame:
    """Span path (§2.9 + M2 + W2): enumerate spans, score, greedy non-overlap
    decode — main.py:344-413 semantics, fused into one kernel.

    ``scorer_factory`` (picklable zero-arg callable returning an object with
    the ``score_sentence`` contract) swaps the scoring backend — e.g.
    ``lambda: TorchSpanScorer(path, enc)`` — built once per Arrow batch
    iterator (executor-local singleton); default is the gazetteer surrogate."""
    entities = entities or LEGALNER_ENTITIES
    enc = encoding_a(entities)
    inv = idx_to_label(enc)
    outside_id = enc["O"]
    if gazetteer is None and scorer_factory is None:
        raise ValueError("need a gazetteer (surrogate) or a scorer_factory")
    gaz_dict = gazetteer.to_broadcastable() if gazetteer is not None else None
    schema = _out_schema(df, id_cols)
    df = repartition_for_extraction(df, id_cols, parallelism)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = (
            scorer_factory()
            if scorer_factory is not None
            else HashedGazetteerSpanScorer(Gazetteer.from_broadcastable(gaz_dict), enc, outside_id)
        )
        # hits-only fast path when the scorer offers it (gazetteer surrogate:
        # misses can never be accepted by the decode, so skipping them is
        # output-identical — see score_hits); a real model scorer without it
        # goes through the full score_sentence contract.
        score = getattr(scorer, "score_hits", scorer.score_sentence)
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in id_cols}
            rows.update(
                {"sent_id": [], "start": [], "end": [], "surface": [], "label": [], "score": []}
            )
            # column lists instead of itertuples()._asdict() (see token path)
            id_vals = [pdf[c].tolist() for c in id_cols]
            for ri, text in enumerate(pdf[text_col].tolist()):
                text = text or ""
                words = py_tokenize_words(text)
                spans, scores, preds = score(words, max_length)
                ms = py_greedy_decode_mentions(
                    len(words), spans, scores, preds, outside_id, inv
                )
                if not ms:
                    continue
                # offsets lazily, only through the furthest accepted word
                starts, ends = py_char_offsets(text, words, max(we for _, we, _, _ in ms))
                for ws, we, lbl, sc in ms:
                    cs, ce = starts[ws], ends[we - 1]
                    for ci, c in enumerate(id_cols):
                        rows[c].append(id_vals[ci][ri])
                    rows["sent_id"].append(0)
                    rows["start"].append(cs)
                    rows["end"].append(ce)
                    rows["surface"].append(text[cs:ce])
                    rows["label"].append(lbl)
                    rows["score"].append(sc)
            yield pd.DataFrame(rows)

    return df.select(*id_cols, text_col).mapInPandas(_extract, schema)


def extract_mentions_from_pages(
    pages: DataFrame,
    id_cols: list[str],
    gazetteer: Gazetteer,
    html_col: str = "html",
    entities: list[str] | None = None,
    max_length: int = ENTITY_MAX_LENGTH,
    parallelism: int | None = None,
    scorer_factory=None,
) -> DataFrame:
    """Fused hot path: HTML -> text -> tokenize -> span score -> greedy decode
    in ONE Python hop.

    Chaining two mapInPandas in the same stage doubles the concurrent Arrow
    workers and ping-pongs each batch JVM<->Python twice — measured 3-5x
    slower at full core width. The fused kernel touches the binary column once
    and emits only mention rows (html never reaches a shuffle).
    ``scorer_factory`` swaps the scoring backend (see extract_mentions_span).
    """
    from .etl.extract import py_html_to_text

    entities = entities or LEGALNER_ENTITIES
    enc = encoding_a(entities)
    inv = idx_to_label(enc)
    outside_id = enc["O"]
    if gazetteer is None and scorer_factory is None:
        raise ValueError("need a gazetteer (surrogate) or a scorer_factory")
    gaz_dict = gazetteer.to_broadcastable() if gazetteer is not None else None
    ids = ", ".join(f"`{c}` {pages.schema[c].dataType.simpleString()}" for c in id_cols)
    schema = f"{ids}, {MENTION_COLS}"
    pages = repartition_for_extraction(pages, id_cols, parallelism)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = (
            scorer_factory()
            if scorer_factory is not None
            else HashedGazetteerSpanScorer(Gazetteer.from_broadcastable(gaz_dict), enc, outside_id)
        )
        score = getattr(scorer, "score_hits", scorer.score_sentence)
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in id_cols}
            rows.update(
                {"sent_id": [], "start": [], "end": [], "surface": [], "label": [], "score": []}
            )
            # column lists instead of itertuples()._asdict() (see token path)
            id_vals = [pdf[c].tolist() for c in id_cols]
            for ri, html in enumerate(pdf[html_col].tolist()):
                text = py_html_to_text(html)
                words = py_tokenize_words(text)
                spans, scores, preds = score(words, max_length)
                ms = py_greedy_decode_mentions(
                    len(words), spans, scores, preds, outside_id, inv
                )
                if not ms:
                    continue
                starts, ends = py_char_offsets(text, words, max(we for _, we, _, _ in ms))
                for ws, we, lbl, sc in ms:
                    cs, ce = starts[ws], ends[we - 1]
                    for ci, c in enumerate(id_cols):
                        rows[c].append(id_vals[ci][ri])
                    rows["sent_id"].append(0)
                    rows["start"].append(cs)
                    rows["end"].append(ce)
                    rows["surface"].append(text[cs:ce])
                    rows["label"].append(lbl)
                    rows["score"].append(sc)
            yield pd.DataFrame(rows)

    return pages.select(*id_cols, html_col).mapInPandas(_extract, schema)


def mentions_to_triples(mentions: DataFrame, subj_col: str = "url") -> DataFrame:
    """A7: mention rows -> distinct (subj, pred, obj) triples with provenance.

    obj = normalized surface until linking assigns a canonical id
    (link/alias.py replaces it). Dedupe is a partial+final hash aggregate.
    """
    triples = mentions.select(
        F.col(subj_col).cast("string").alias("subj"),
        F.concat(F.lit("mentions_"), F.lower("label")).alias("pred"),
        F.regexp_replace(F.lower(F.trim("surface")), r"\s+", " ").alias("obj"),
        F.col(subj_col).cast("string").alias("url"),
        "start",
        "end",
    )
    return triples.dropDuplicates(["subj", "pred", "obj"])
