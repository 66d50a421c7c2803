"""Mention decoding — the reference's two decode algorithms, Spark-first.

W1  adjacent-merge (legal_ner/inference.py:53-79): merge consecutive non-O
    tokens of the same entity TYPE into one char-span mention. Relationally a
    gaps-and-islands problem -> lag + running sum + groupBy (pure window
    functions, zero Python in the loop).

W2  greedy non-overlap span decode (legal_ner/main.py:409-413): take spans by
    score descending (stable ties = enumeration order), accept iff all covered
    words still "O". Inherently sequential per sentence -> Arrow-batched kernel.

Each has a verbatim-semantics pure-Python twin (py_*) used as the parity
oracle in tests (SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .spans import ENTITY_MAX_LENGTH, py_enumerate_spans

# ---------------------------------------------------------------------------
# W1: adjacent-merge
# ---------------------------------------------------------------------------


def py_adjacent_merge(
    offsets: list[tuple[int, int]], types: list[str]
) -> list[dict]:
    """Exact semantics of inference.py:53-79 given per-token char offsets and
    B/I-stripped predicted types ('O' for outside)."""
    predictions: list[dict] = []
    for i, (offset, prediction) in enumerate(zip(offsets, types)):
        if prediction != "O":
            if i > 0:
                prec_prediction = types[i - 1]
                if prediction == prec_prediction:
                    predictions[-1]["end"] = offset[1]
                else:
                    predictions.append(
                        {"label": prediction, "start": offset[0], "end": offset[1]}
                    )
            else:
                predictions.append(
                    {"label": prediction, "start": offset[0], "end": offset[1]}
                )
    return predictions


def adjacent_merge(
    token_df: DataFrame,
    doc_cols: list[str],
    type_col: str = "pred_type",
    order_col: str = "tok_idx",
) -> DataFrame:
    """Distributed adjacent-merge over token rows
    (doc_cols..., tok_idx, start, end, pred_type).

    Returns (doc_cols..., mention_id, label, start, end). The window is
    partitioned per document — mentions never cross documents, so this scales
    by hash-partitioning on the doc key with no global ordering.
    """
    w = Window.partitionBy(*doc_cols).orderBy(order_col)
    typ = F.col(type_col)
    flagged = token_df.withColumn("_prev", F.lag(type_col).over(w)).withColumn(
        "_new",
        (
            (typ != "O")
            & (F.col("_prev").isNull() | (F.col("_prev") != typ))
        ).cast("int"),
    )
    numbered = flagged.withColumn(
        "mention_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        numbered.filter(typ != "O")
        .groupBy(*doc_cols, "mention_id", typ.alias("label"))
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
    )


# ---------------------------------------------------------------------------
# W2: greedy non-overlap span decode
# ---------------------------------------------------------------------------


def py_greedy_decode(
    num_words: int,
    spans: list[tuple[int, int]],
    scores: list[float],
    pred_labels: list[int],
    outside_id: int,
    id2label: dict[int, str],
) -> list[str]:
    """Exact semantics of main.py:409-413 -> IOB2 tags per word.

    ``sorted(..., key=tup[0], reverse=True)`` sorts by score ONLY; Python's
    stable sort breaks ties by enumeration order — preserved here.
    """
    pred_labels_per_tokens = ["O"] * num_words
    for _, span, pred_label in sorted(
        zip(scores, spans, pred_labels), key=lambda tup: tup[0], reverse=True
    ):
        if pred_label != outside_id and all(
            pred_labels_per_tokens[i] == "O" for i in range(span[0], span[1])
        ):
            pred_labels_per_tokens[span[0]] = "B-" + id2label[pred_label]
            pred_labels_per_tokens[span[0] + 1 : span[1]] = [
                "I-" + id2label[pred_label]
            ] * (span[1] - span[0] - 1)
    return pred_labels_per_tokens


def py_greedy_decode_mentions(
    num_words: int,
    spans: list[tuple[int, int]],
    scores: list[float],
    pred_labels: list[int],
    outside_id: int,
    id2label: dict[int, str],
) -> list[tuple[int, int, str, float]]:
    """Same algorithm, emitting accepted spans (w_start, w_end, type, score)
    instead of IOB2 — the mention-level contract used by the KG pipeline.
    Emission order: accepted order (score desc, stable)."""
    taken = [False] * num_words
    out: list[tuple[int, int, str, float]] = []
    for score, span, pred_label in sorted(
        zip(scores, spans, pred_labels), key=lambda tup: tup[0], reverse=True
    ):
        if pred_label != outside_id and not any(taken[span[0] : span[1]]):
            for i in range(span[0], span[1]):
                taken[i] = True
            lbl = id2label[pred_label]
            lbl = lbl.split("-")[-1]  # B-X id stands for type X
            out.append((span[0], span[1], lbl, float(score)))
    return out


def greedy_decode(
    scored: DataFrame,
    doc_cols: list[str],
    id2label: dict[int, str],
    outside_id: int = 0,
    max_length: int = ENTITY_MAX_LENGTH,
) -> DataFrame:
    """Distributed greedy decode over sentence rows
    (doc_cols..., num_words:int, scores:array<double>, preds:array<int>)
    where scores/preds are in reference span-enumeration order.

    Spans are re-enumerated inside the kernel from num_words — they never
    materialize in the shuffle. Returns
    (doc_cols..., w_start, w_end, label, score).
    """
    out_fields = ", ".join(
        f"`{c}` {scored.schema[c].dataType.simpleString()}" for c in doc_cols
    )
    out_schema = f"{out_fields}, w_start int, w_end int, label string, score double"

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in doc_cols}
            rows.update({"w_start": [], "w_end": [], "label": [], "score": []})
            for rec in pdf.itertuples(index=False):
                d = rec._asdict()
                n = int(d["num_words"])
                spans = py_enumerate_spans(n, max_length)
                for ws, we, lbl, sc in py_greedy_decode_mentions(
                    n, spans, list(d["scores"]), list(d["preds"]), outside_id, id2label
                ):
                    for c in doc_cols:
                        rows[c].append(d[c])
                    rows["w_start"].append(ws)
                    rows["w_end"].append(we)
                    rows["label"].append(lbl)
                    rows["score"].append(sc)
            yield pd.DataFrame(rows)

    return scored.select(*doc_cols, "num_words", "scores", "preds").mapInPandas(
        _decode, out_schema
    )
