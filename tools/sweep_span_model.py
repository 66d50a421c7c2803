"""Experiment harness for the span scorer: driver-side train/eval sweeps.

Evaluation is the verbatim single-threaded decode loop that
``tests/test_trained_scorer.py::test_spark_pipeline_matches_driver_decode``
proves identical to the distributed pipeline, so sweep numbers transfer
1:1 to the Spark path. Selection discipline: variants are COMPARED on a
train-side 5-fold cross-validation (fold = doc-id hash), and only the
chosen variant's heldout number is reported — the heldout split stays
untouched by selection.

Usage:
  python tools/sweep_span_model.py cv          # CV scores for all variants
  python tools/sweep_span_model.py heldout V   # train on full train split,
                                               # report heldout for variant V
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from spanluke_spark.ner.decode import py_greedy_decode_mentions
from spanluke_spark.ner.scorer import stable_hash64
from spanluke_spark.ner.spans import ENTITY_MAX_LENGTH
from spanluke_spark.ner.train import (
    gold_word_spans,
    load_legalner_docs,
    split_docs,
)
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a, idx_to_label

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"
ENC = encoding_a(LEGALNER_ENTITIES)
INV = idx_to_label(ENC)
OUT_ID = ENC["O"]

BASE_HP = dict(
    dim=1 << 16, epochs=30, lr=0.05, l2=1e-6,
    neg_keep=0.1, neg_weighting=False, batch_size=4096,
)

# variant name -> (hyperparam overrides, o_margin subtracted from the O bias)
VARIANTS = {
    "base": ({}, 0.0),
    "margin0.5": ({}, 0.5),
    "margin1.0": ({}, 1.0),
    "margin1.5": ({}, 1.5),
    "margin2.0": ({}, 2.0),
    "ep60": ({"epochs": 60}, 0.0),
    "ep60_m1.0": ({"epochs": 60}, 1.0),
    "dim17": ({"dim": 1 << 17}, 0.0),
    "dim17_m1.0": ({"dim": 1 << 17}, 1.0),
    "ep60_dim17_m1.0": ({"epochs": 60, "dim": 1 << 17}, 1.0),
    "ep90_m1.0": ({"epochs": 90}, 1.0),
    "ep120_m1.0": ({"epochs": 120}, 1.0),
}


def train_variant(train_docs, hp, o_margin, path):
    from spanluke_spark.ner.train import train_legalner_span_model

    train_legalner_span_model(train_docs, ENC, OUT_ID, path, **hp)
    if o_margin:
        with np.load(path, allow_pickle=False) as z:
            data = {k: z[k] for k in z.files}
        data["b"] = data["b"].copy()
        data["b"][OUT_ID] -= o_margin
        np.savez_compressed(path, **data)
    return path


def eval_driver(model_path, docs):
    """Strict span P/R/F1 via the decode-identity loop (no Spark)."""
    from spanluke_spark.etl.tokenize import py_tokenize_offsets
    from spanluke_spark.ner.scorer import TorchSpanScorer

    scorer = TorchSpanScorer(model_path, ENC)
    tp = npred = ngold = 0
    for doc_id, text, anns in docs:
        toks = py_tokenize_offsets(text)
        words = [t for t, _, _ in toks]
        gold = set()
        for ws, we, lbl in gold_word_spans(text, anns):
            if ws >= len(toks):
                continue
            gold.add((toks[ws][1], toks[min(we, len(toks)) - 1][2], lbl))
        spans, scores, preds = scorer.score_sentence(words)
        pred = set()
        for ws, we, lbl, _sc in py_greedy_decode_mentions(
            len(words), spans, scores, preds, OUT_ID, INV
        ):
            pred.add((toks[ws][1], toks[we - 1][2], lbl))
        tp += len(gold & pred)
        npred += len(pred)
        ngold += len(gold)
    p = tp / npred if npred else 0.0
    r = tp / ngold if ngold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f1


def cv_folds(train_docs, k=5):
    for fold in range(k):
        tr = [d for d in train_docs if stable_hash64("cv|" + d[0]) % k != fold]
        va = [d for d in train_docs if stable_hash64("cv|" + d[0]) % k == fold]
        yield tr, va


def main():
    docs = load_legalner_docs(DEV_JSON)
    train, held = split_docs(docs)
    mode = sys.argv[1] if len(sys.argv) > 1 else "cv"
    tmp = "/tmp/sweep_model.npz"

    if mode == "cv":
        names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(VARIANTS)
        for name in names:
            hp_over, margin = VARIANTS[name]
            hp = {**BASE_HP, **hp_over}
            f1s = []
            t0 = time.time()
            for tr, va in cv_folds(train, k=5):
                train_variant(tr, hp, margin, tmp)
                f1s.append(eval_driver(tmp, va)[2])
            print(
                f"{name:12s} cv-F1 mean={np.mean(f1s):.4f} "
                f"folds={[round(x, 3) for x in f1s]} ({time.time() - t0:.0f}s)",
                flush=True,
            )
    else:
        name = sys.argv[2]
        hp_over, margin = VARIANTS[name]
        hp = {**BASE_HP, **hp_over}
        train_variant(train, hp, margin, tmp)
        p, r, f1 = eval_driver(tmp, held)
        print(f"{name}: heldout strict P={p:.4f} R={r:.4f} F1={f1:.4f}")


if __name__ == "__main__":
    main()
