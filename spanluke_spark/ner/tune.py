"""M4 — distributed hyperparameter search for the span scorer.

Reference analogue: ``legal_ner/tuning.py`` (Optuna study driving repeated
``main.py`` training runs on one GPU, one trial at a time) and the manual
sweep protocol in ``models/TRAINING.md``. Here the search is expressed
Spark-first: the (variant x fold) trial grid is a DataFrame, each trial is
an independent task (train on the fold's train side, evaluate strict-span
P/R/F1 on the fold's validation side), and executors run trials in
parallel via ``mapInPandas``. Selection discipline matches
tools/sweep_span_model.py: variants are COMPARED on K-fold CV over the
train split only; the heldout split is never an input to selection.

Scale shape: the labeled corpus is tiny relative to the grid (hundreds of
documents vs. dozens-to-thousands of trials), so docs ship to executors as
a broadcast and the shuffle carries only the trial table (a few bytes per
row) plus one metrics row back per trial. At a corpus too large to
broadcast, pass a parquet path instead and let each trial re-scan its fold
(the trial table stays the only shuffled data either way). Every trial is
deterministic (hash-derived folds, zero-init convex training, fixed batch
order), so the search result is reproducible bit-for-bit — rerunning the
grid cannot pick a different winner.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

TRIAL_RESULT_SCHEMA = (
    "variant string, fold int, n_train int, n_val int, "
    "tp int, n_pred int, n_gold int, "
    "precision double, recall double, f1 double"
)


def cv_fold_of(doc_id: str, k: int) -> int:
    """Deterministic fold assignment — must match tools/sweep_span_model.py."""
    from spanluke_spark.ner.scorer import stable_hash64

    return stable_hash64("cv|" + doc_id) % k


def _eval_strict_counts(model_path, docs, enc, out_id, inv):
    """Strict span (tp, n_pred, n_gold) via the decode-identity loop that
    tests/test_trained_scorer.py proves equal to the distributed pipeline."""
    from spanluke_spark.etl.tokenize import py_tokenize_offsets
    from spanluke_spark.ner.decode import py_greedy_decode_mentions
    from spanluke_spark.ner.scorer import TorchSpanScorer
    from spanluke_spark.ner.train import gold_word_spans

    scorer = TorchSpanScorer(model_path, enc)
    tp = n_pred = n_gold = 0
    for _doc_id, text, anns in docs:
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
            len(words), spans, scores, preds, out_id, inv
        ):
            pred.add((toks[ws][1], toks[we - 1][2], lbl))
        tp += len(gold & pred)
        n_pred += len(pred)
        n_gold += len(gold)
    return tp, n_pred, n_gold


def run_trial(docs, hp: dict, fold: int, k: int, enc, out_id, inv):
    """Train on the fold's train side, score the fold's validation side.

    ``o_margin`` (decision-threshold prior subtracted from the O bias) is
    applied to the exported artifact exactly as tools/sweep_span_model.py
    does, so sweep numbers and distributed-search numbers are comparable.
    """
    import numpy as np

    from spanluke_spark.ner.train import train_legalner_span_model

    hp = dict(hp)
    o_margin = float(hp.pop("o_margin", 0.0))
    tr = [d for d in docs if cv_fold_of(d[0], k) != fold]
    va = [d for d in docs if cv_fold_of(d[0], k) == fold]
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "trial.npz")
        train_legalner_span_model(tr, enc, out_id, path, **hp)
        if o_margin:
            with np.load(path, allow_pickle=False) as z:
                data = {key: z[key] for key in z.files}
            data["b"] = data["b"].copy()
            data["b"][out_id] -= o_margin
            np.savez_compressed(path, **data)
        tp, n_pred, n_gold = _eval_strict_counts(path, va, enc, out_id, inv)
    p = tp / n_pred if n_pred else 0.0
    r = tp / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return len(tr), len(va), tp, n_pred, n_gold, p, r, f1


def grid_search_cv(
    spark: SparkSession,
    docs: list,
    grid: dict[str, dict],
    enc: dict[str, int],
    out_id: int,
    k: int = 5,
) -> DataFrame:
    """Distributed K-fold CV over a named hyperparameter grid.

    ``grid`` maps variant name -> hyperparameter dict (keys accepted by
    ``train_legalner_span_model``, plus optional ``o_margin``). Returns one
    row per (variant, fold) trial with strict-span counts and P/R/F1.
    len(grid) * k independent trials run concurrently, one per task.
    """
    from spanluke_spark.schemas import idx_to_label

    inv = idx_to_label(enc)
    sc = spark.sparkContext
    docs_bc = sc.broadcast(list(docs))
    trials = [
        (name, json.dumps(hp, sort_keys=True), fold)
        for name, hp in sorted(grid.items())
        for fold in range(k)
    ]
    trials_df = spark.createDataFrame(
        trials, "variant string, hp_json string, fold int"
    ).repartition(len(trials))

    def run_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local_docs = docs_bc.value
        for pdf in batches:
            out = []
            for variant, hp_json, fold in zip(
                pdf["variant"], pdf["hp_json"], pdf["fold"]
            ):
                n_tr, n_va, tp, n_pred, n_gold, p, r, f1 = run_trial(
                    local_docs, json.loads(hp_json), int(fold), k, enc, out_id, inv
                )
                out.append(
                    (variant, int(fold), n_tr, n_va, tp, n_pred, n_gold, p, r, f1)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "variant", "fold", "n_train", "n_val",
                    "tp", "n_pred", "n_gold", "precision", "recall", "f1",
                ],
            )

    return trials_df.mapInPandas(run_partition, TRIAL_RESULT_SCHEMA)


def select_best(trial_results: DataFrame) -> tuple[str, float]:
    """Aggregate trials to per-variant mean CV F1 and return the winner.

    Ties break on variant name so the selection is deterministic — the
    search can never return different winners on identical inputs.
    """
    from pyspark.sql import functions as F

    rows = (
        trial_results.groupBy("variant")
        .agg(F.avg("f1").alias("cv_f1"), F.count("*").alias("n_folds"))
        .orderBy(F.col("cv_f1").desc(), F.col("variant"))
        .collect()  # bounded: one row per grid variant
    )
    best = rows[0]
    return best["variant"], float(best["cv_f1"])
