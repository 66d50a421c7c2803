"""M4 gates: distributed hyperparameter search (ner/tune.py).

Reference analogue: legal_ner/tuning.py (sequential Optuna trials on one
GPU). The Spark version runs the (variant x fold) grid as parallel tasks;
these tests pin (1) exact parity between a distributed trial row and the
same trial run driver-side, (2) deterministic winner selection, and
(3) the scale shape — only the trial table shuffles, docs ride a
broadcast.
"""

import json

import pytest

from spanluke_spark.ner.train import load_legalner_docs
from spanluke_spark.ner.tune import (
    cv_fold_of,
    grid_search_cv,
    run_trial,
    select_best,
)
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a, idx_to_label

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"
ENC = encoding_a(LEGALNER_ENTITIES)
OUT_ID = ENC["O"]

TINY = dict(dim=1 << 12, epochs=2, lr=0.05, l2=1e-6, neg_keep=0.1)
GRID = {
    "tiny": dict(TINY),
    "tiny_margin": dict(TINY, o_margin=1.0),
}


@pytest.fixture(scope="module")
def docs():
    return load_legalner_docs(DEV_JSON)[:60]


@pytest.fixture(scope="module")
def trial_rows(spark, docs):
    df = grid_search_cv(spark, docs, GRID, ENC, OUT_ID, k=2)
    return {(r["variant"], r["fold"]): r for r in df.collect()}


def test_grid_shape_and_counts(trial_rows, docs):
    assert set(trial_rows) == {
        (v, f) for v in GRID for f in range(2)
    }
    for (variant, fold), r in trial_rows.items():
        assert r["n_train"] + r["n_val"] == len(docs)
        assert r["n_val"] == sum(1 for d in docs if cv_fold_of(d[0], 2) == fold)
        assert 0.0 <= r["f1"] <= 1.0
        assert r["tp"] <= min(r["n_pred"], r["n_gold"])


def test_distributed_trial_matches_driver_trial(trial_rows, docs):
    """Bit-identical parity: the executor-side trial == the same trial run
    in-process (deterministic folds + zero-init convex training)."""
    inv = idx_to_label(ENC)
    for variant, fold in [("tiny", 0), ("tiny_margin", 1)]:
        hp = json.loads(json.dumps(GRID[variant]))  # same round-trip as the job
        expected = run_trial(docs, hp, fold, 2, ENC, OUT_ID, inv)
        got = trial_rows[(variant, fold)]
        assert (
            got["n_train"], got["n_val"], got["tp"],
            got["n_pred"], got["n_gold"],
        ) == expected[:5]
        assert got["f1"] == pytest.approx(expected[7], abs=0.0)


def test_select_best_deterministic(spark, trial_rows):
    rows = list(trial_rows.values())
    df = spark.createDataFrame(rows)
    winner, cv_f1 = select_best(df)
    by_variant = {}
    for r in rows:
        by_variant.setdefault(r["variant"], []).append(r["f1"])
    means = {v: sum(fs) / len(fs) for v, fs in by_variant.items()}
    # winner = max mean F1, ties broken by name
    best = sorted(means.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (winner, cv_f1) == (best[0], pytest.approx(best[1]))


def test_only_trial_table_shuffles(spark, docs):
    """Scale-shape gate: the job's input DataFrame is the trial grid (one
    tiny row per trial); documents reach executors via broadcast, so the
    plan contains no join or aggregation over the corpus itself."""
    df = grid_search_cv(spark, docs, {"tiny": dict(TINY)}, ENC, OUT_ID, k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" in plan or "MapInPandas" in plan
    assert "Join" not in plan
