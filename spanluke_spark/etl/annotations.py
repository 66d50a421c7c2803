"""Label-Studio annotated-document ingestion + the reference's ETL semantics.

Covers SURVEY.md operators S1/P1 (JSON scan + annotation projection), the
convert_dataset ETL (§3.3), and the match_labels char->token range alignment (J1).

The conversion kernels replicate the observed behavior of
legal_ner/utils/convert_dataset.py and legal_ner/utils/utils.py exactly —
including their quirks (later annotations overwrite earlier tags; list-slice
assignment may change the tag-list length when annotation boundaries split
words) — because byte-parity with the bundled NER_DEV_ALL_DOC.jsonl is the gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import LEGALNER_ENTITIES, encoding_b

# ---------------------------------------------------------------------------
# S1: Label-Studio JSON scan -> flat docs + annotations DataFrames
# ---------------------------------------------------------------------------


def read_labelstudio(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Read a Label-Studio JSON array (legal_ner/utils/dataset.py:38-49 shape)
    into flat (docs, annotations) DataFrames.

    ``multiLine=True`` parses the whole-array file; ``file_order`` preserves
    document order within each input file (order is load-bearing for the
    reference's document/sentence-id assignment, convert_dataset.py:19-23).
    """
    raw = spark.read.option("multiLine", "true").json(path)
    # One input file -> one partition under multiLine, so this id is the
    # in-file order; for many files the (file, order) pair is what matters.
    ordered = raw.withColumn("file_order", F.monotonically_increasing_id())

    docs = ordered.select(
        F.col("id").alias("doc_id"),
        "file_order",
        F.col("data.text").alias("text"),
        F.col("meta.source").alias("source"),
    )

    anns = (
        ordered.select(
            F.col("id").alias("doc_id"),
            F.posexplode(F.col("annotations")[0]["result"]).alias("ann_order", "r"),
        )
        .select(
            "doc_id",
            "ann_order",
            F.col("r.value.start").cast("int").alias("start"),
            F.col("r.value.end").cast("int").alias("end"),
            F.col("r.value.labels")[0].alias("label"),
            F.col("r.value.text").alias("surface"),
        )
    )
    return docs, anns


# ---------------------------------------------------------------------------
# §3.3 ETL: documents -> word tokens + Encoding-B int tags
# ---------------------------------------------------------------------------


def py_convert_doc(
    text: str,
    annotations: list[dict],
    entity_to_tag: dict[str, int] | None = None,
) -> tuple[list[str], list[int]]:
    """Exact semantics of legal_ner/utils/convert_dataset.py:12-43 for one doc.

    ``annotations``: list of {"start","end","label","surface"} in file order.
    Replicated quirks: tag count comes from ``surface.split()`` while the slice
    width comes from ``text[start:end].split()`` (lengths can differ, mutating
    the list length); later annotations overwrite earlier ones.
    """
    if entity_to_tag is None:
        entity_to_tag = encoding_b(LEGALNER_ENTITIES)
    ner_tags = [0] * len(text.split())
    for anno in annotations:
        entity = anno["label"]
        words = (anno.get("surface") or "").split()
        ner_tag = ["B-" + entity]
        if len(words) != 1:
            ner_tag += ["I-" + entity] * (len(words) - 1)
        final_tags = [entity_to_tag[n] for n in ner_tag]
        start, end = anno["start"], anno["end"]
        start_token = len(text[:start].split())
        end_token = start_token + len(text[start:end].split())
        ner_tags[start_token:end_token] = final_tags
    return text.split(), ner_tags


def convert_documents(docs: DataFrame, anns: DataFrame, doc_key_index: int = 0) -> DataFrame:
    """Distributed convert_dataset ETL:
    (docs, annotations) -> (tokens, ner_tags, document_id, sentence_id, file_order).

    Relational part (document/sentence ids) is pure window functions; the
    Python-slice tag assignment runs per doc in an Arrow-batched kernel.

    ``doc_key_index``: which ``source.split(" ")`` element keys a document.
    The bundled convert_dataset.py:19 says ``[1]``, but the golden
    NER_DEV_ALL_DOC.jsonl it shipped was verifiably generated with ``[0]``
    (the category_court prefix; 124 distinct docs) — the artifact wins, so
    the default is 0.
    """
    with_word = docs.withColumn(
        "doc_word", F.element_at(F.split("source", " ", -1), doc_key_index + 1)
    )

    # sentence_id: running counter per doc_word in file order (0-based).
    w_sent = Window.partitionBy("doc_word").orderBy("file_order")
    # document_id: order of first appearance of doc_word.
    first_seen = Window.partitionBy("doc_word")
    w_doc = Window.orderBy("first_order")
    keyed = (
        with_word.withColumn("sentence_id", F.row_number().over(w_sent) - F.lit(1))
        .withColumn("first_order", F.min("file_order").over(first_seen))
        .withColumn("document_id", F.dense_rank().over(w_doc) - F.lit(1))
    )

    ann_structs = anns.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ann_order", "start", "end", "label", "surface"))
        ).alias("anns")
    )
    joined = keyed.join(ann_structs, "doc_id", "left")

    entity_to_tag = encoding_b(LEGALNER_ENTITIES)

    def _convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks, tags = [], []
            for text, ann_list in zip(pdf["text"], pdf["anns"]):
                anns_py = [
                    {
                        "start": int(a["start"]),
                        "end": int(a["end"]),
                        "label": a["label"],
                        "surface": a["surface"],
                    }
                    for a in (ann_list if ann_list is not None else [])
                ]
                tk, tg = py_convert_doc(text or "", anns_py, entity_to_tag)
                toks.append(tk)
                tags.append(tg)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "file_order": pdf["file_order"],
                    "document_id": pdf["document_id"],
                    "sentence_id": pdf["sentence_id"],
                    "tokens": toks,
                    "ner_tags": tags,
                }
            )

    out_schema = (
        "doc_id string, file_order long, document_id long, sentence_id long, "
        "tokens array<string>, ner_tags array<int>"
    )
    return joined.select(
        "doc_id", "file_order", "document_id", "sentence_id", "text", "anns"
    ).mapInPandas(_convert, out_schema)


# ---------------------------------------------------------------------------
# S3/S4: JSONL + Label-Studio prediction sinks
# ---------------------------------------------------------------------------


def write_tokenized_jsonl(converted: DataFrame, path: str) -> None:
    """S3: word-token JSONL sink — one {"tokens", "ner_tags", "document_id",
    "sentence_id"} object per line (convert_dataset.py:61-63 shape)."""
    converted.select("tokens", "ner_tags", "document_id", "sentence_id").write.mode(
        "overwrite"
    ).json(path)


def to_labelstudio_predictions(mentions: DataFrame, doc_col: str = "doc_id") -> DataFrame:
    """S4: mention rows -> Label-Studio prediction records, the exact output
    contract of legal_ner/inference.py:160-175:

        { value: {start, end, text, labels: [label]},
          id: "<doc>-<j>", from_name: "label", to_name: "text", type: "labels" }

    ``j`` is the mention's rank within its document by (start, end) —
    deterministic, matching the reference's enumeration order.
    """
    w = Window.partitionBy(doc_col).orderBy("start", "end")
    ranked = mentions.withColumn("_j", F.row_number().over(w) - 1)
    return ranked.select(
        F.col(doc_col).alias("doc_id"),
        F.struct(
            F.col("start"),
            F.col("end"),
            F.col("surface").alias("text"),
            F.array(F.col("label")).alias("labels"),
        ).alias("value"),
        F.concat(F.col(doc_col).cast("string"), F.lit("-"), F.col("_j").cast("string")).alias("id"),
        F.lit("label").alias("from_name"),
        F.lit("text").alias("to_name"),
        F.lit("labels").alias("type"),
    )


# ---------------------------------------------------------------------------
# J1: match_labels — char->token range alignment (legal_ner/utils/utils.py:11-44)
# ---------------------------------------------------------------------------


def py_match_labels(
    token_offsets: list[tuple[int, int]], annotations: list[dict]
) -> list[str]:
    """Exact semantics of utils.py match_labels over (start,end-exclusive)
    token offsets: first covered token gets B-, later covered tokens get I-
    only where still "O"; B- overwrites unconditionally."""
    aligned = ["O"] * len(token_offsets)

    def char_to_token(ci: int) -> int | None:
        for ti, (s, e) in enumerate(token_offsets):
            if s <= ci < e:
                return ti
        return None

    for anno in annotations:
        previous_token = None
        for char_ix in range(anno["start"], anno["end"]):
            token_ix = char_to_token(char_ix)
            if token_ix is not None:
                if previous_token is not None:
                    if aligned[token_ix] == "O":
                        aligned[token_ix] = "I-" + anno["label"]
                else:
                    aligned[token_ix] = "B-" + anno["label"]
                    previous_token = token_ix
    return aligned


def match_labels_join(token_df: DataFrame, anns: DataFrame) -> DataFrame:
    """Relational match_labels: range join of tokens x annotations on char
    overlap, then B/I assignment via window functions.

    tokens: (doc_id, tok_idx, token, start, end);  anns: ANNOTATIONS schema.
    Returns (doc_id, tok_idx, aligned_label). Equivalent to py_match_labels
    when annotations don't overlap each other (property-tested); the iterative
    overwrite order of the reference is only observable under overlapping
    annotations, which the LegalNER data doesn't contain.
    """
    t = token_df.alias("t")
    a = anns.alias("a")
    # Interval overlap: token [ts,te) covers some char of annotation [as,ae).
    hit = t.join(
        a,
        (F.col("t.doc_id") == F.col("a.doc_id"))
        & (F.col("t.start") < F.col("a.end"))
        & (F.col("t.end") > F.col("a.start")),
        "inner",
    ).select(
        F.col("t.doc_id").alias("doc_id"),
        "t.tok_idx",
        "a.ann_order",
        "a.label",
    )
    w = Window.partitionBy("doc_id", "ann_order").orderBy("tok_idx")
    bio = hit.withColumn(
        "bio",
        F.when(F.row_number().over(w) == 1, F.concat(F.lit("B-"), F.col("label"))).otherwise(
            F.concat(F.lit("I-"), F.col("label"))
        ),
    )
    # One label per token: earliest annotation wins for I- (reference keeps
    # first non-O), B- beats I- at equal order (B overwrites unconditionally).
    w_tok = Window.partitionBy("doc_id", "tok_idx").orderBy(
        F.when(F.col("bio").startswith("B-"), F.lit(0)).otherwise(F.lit(1)),
        "ann_order",
    )
    picked = (
        bio.withColumn("rn", F.row_number().over(w_tok))
        .filter(F.col("rn") == 1)
        .select("doc_id", "tok_idx", F.col("bio").alias("aligned_label"))
    )
    return token_df.join(picked, ["doc_id", "tok_idx"], "left").withColumn(
        "aligned_label", F.coalesce("aligned_label", F.lit("O"))
    )
