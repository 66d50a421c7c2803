"""Produce the committed trained span-scorer artifact and its honest metrics.

Trains the hashed-feature softmax regression (spanluke_spark/ner/train.py) on
the TRAIN side of a deterministic doc-level split of SpanLuke's LegalNER dev
export, writes ``spanluke_spark/models/legalner_span_lr.npz``, then runs the
HELDOUT side through the real distributed pipeline
(``extract_mentions_span`` + ``NumpyLinearBackend``) and reports
nervaluate-style strict/exact/partial/ent_type P/R/F1 against the human gold
annotations (word-span-snapped, the reference's own convert_dataset.py:38-40
rule). The printed numbers go into BASELINE.md next to the paper's Table I.

Run: python tools/train_span_model.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spanluke_spark.evaluation.metrics import nervaluate_counts, strict_prf
from spanluke_spark.ner.train import (
    gold_word_spans,
    load_legalner_docs,
    split_docs,
    train_legalner_span_model,
)
from spanluke_spark.pipeline import extract_mentions_span
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a
from spanluke_spark.session import get_spark

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"
MODEL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spanluke_spark", "models", "legalner_span_lr.npz",
)
# chosen by 5-fold CV over the train split (round-5 sweep,
# tools/sweep_span_model.py; table in TRAINING.md) — heldout touched once.
# O_MARGIN is a decision-threshold prior subtracted from the O-class bias
# at export time (CV-selected alongside epochs); deterministic — no RNG.
HYPERPARAMS = dict(
    dim=1 << 16, epochs=120, lr=0.05, l2=1e-6,
    neg_keep=0.1, neg_weighting=False, batch_size=4096,
)
O_MARGIN = 1.0


def snapped_gold_char_spans(docs):
    """Heldout gold as (doc_id, start, end, label) char spans snapped to
    whitespace-token boundaries via the reference's char->word rule, so a
    word-level strict match is exactly a char-level strict match."""
    from spanluke_spark.etl.tokenize import py_tokenize_offsets

    rows = []
    for doc_id, text, anns in docs:
        toks = py_tokenize_offsets(text)
        for ws, we, lbl in gold_word_spans(text, anns):
            if ws >= len(toks):
                continue
            we = min(we, len(toks))
            rows.append((doc_id, toks[ws][1], toks[we - 1][2], lbl))
    return rows


def main():
    docs = load_legalner_docs(DEV_JSON)
    train, held = split_docs(docs)
    enc = encoding_a(LEGALNER_ENTITIES)
    print(f"train docs={len(train)} heldout docs={len(held)}")

    os.makedirs(os.path.dirname(MODEL_PATH), exist_ok=True)
    t0 = time.time()
    train_legalner_span_model(train, enc, enc["O"], MODEL_PATH, **HYPERPARAMS)
    if O_MARGIN:
        import numpy as np

        with np.load(MODEL_PATH, allow_pickle=False) as z:
            data = {k: z[k] for k in z.files}
        data["b"] = data["b"].copy()
        data["b"][enc["O"]] -= O_MARGIN
        np.savez_compressed(MODEL_PATH, **data)
    print(f"trained -> {MODEL_PATH} ({time.time() - t0:.1f}s, "
          f"{os.path.getsize(MODEL_PATH) / 1e6:.2f} MB)")

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    from spanluke_spark.ner.scorer import TorchSpanScorer

    docs_df = spark.createDataFrame(
        [(d, t) for d, t, _ in held], "doc_id string, text string"
    ).repartition(8)
    mentions = extract_mentions_span(
        docs_df, ["doc_id"], gazetteer=None,
        scorer_factory=lambda: TorchSpanScorer(MODEL_PATH, enc),
    )
    pred = mentions.selectExpr("doc_id as doc", "start", "end", "label")
    gold = spark.createDataFrame(
        snapped_gold_char_spans(held), "doc string, start int, end int, label string"
    )
    t0 = time.time()
    m = strict_prf(gold, pred)
    print(f"heldout strict (Spark pipeline, {time.time() - t0:.1f}s): "
          f"P={m['precision']:.4f} R={m['recall']:.4f} F1={m['f1']:.4f}")
    for row in nervaluate_counts(gold, pred).collect():
        print(f"  {row['regime']:9s} P={row['precision']:.4f} "
              f"R={row['recall']:.4f} F1={row['f1']:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
