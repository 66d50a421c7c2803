"""Late-interaction MaxSim retrieval — numpy brute-force parity on
random token sets (exact integer-quantized dots, so equality is exact,
never approx), deterministic doc-asc tie-break, dimension slicing, and
a plan audit that the query side broadcasts (the doc-token side never
shuffles to score)."""

from __future__ import annotations

import random

import numpy as np

from spanluke_spark.textops.late_interaction import maxsim_topk


def _mk(rng, n_ids, toks_each, dim, id0=0):
    return [
        (id0 + i, t, [rng.uniform(-1, 1) for _ in range(dim)])
        for i in range(n_ids)
        for t in range(toks_each)
    ]


def _np_maxsim(qrows, drows, k, scale, d):
    def quant(v):
        return np.round(np.asarray(v[:d], dtype=np.float64) * scale).astype(
            np.int64
        )

    qtok = {}
    for q, t, v in qrows:
        qtok.setdefault(q, []).append(quant(v))
    dtok = {}
    for doc, t, v in drows:
        dtok.setdefault(doc, []).append(quant(v))
    out = []
    for q, qvs in qtok.items():
        scores = []
        for doc, dvs in dtok.items():
            dm = np.stack(dvs)
            s = sum(int((dm @ qv).max()) for qv in qvs)
            scores.append((s, doc))
        scores.sort(key=lambda x: (-x[0], x[1]))
        out.extend((q, r + 1, doc, s) for r, (s, doc) in enumerate(scores[:k]))
    return set(out)


def _spark_maxsim(spark, qrows, drows, k, scale, d):
    qdf = spark.createDataFrame(
        qrows, "q_id: long, tok_id: long, vec: array<double>"
    )
    ddf = spark.createDataFrame(
        drows, "doc_id: long, tok_id: long, vec: array<double>"
    )
    res = maxsim_topk(qdf, ddf, k=k, scale=scale, d=d)
    return res, {
        (r["q_id"], r["rank"], r["doc_id"], r["score"]) for r in res.collect()
    }


def test_random_parity_vs_numpy(spark):
    rng = random.Random(11)
    qrows = _mk(rng, 3, 4, 8)
    drows = _mk(rng, 25, 6, 8, id0=100)
    _, got = _spark_maxsim(spark, qrows, drows, k=7, scale=64, d=8)
    assert got == _np_maxsim(qrows, drows, 7, 64, 8)


def test_dim_slice_and_scale(spark):
    rng = random.Random(3)
    qrows = _mk(rng, 2, 3, 12)
    drows = _mk(rng, 15, 5, 12, id0=50)
    # score only the first 6 dims at a coarser scale
    _, got = _spark_maxsim(spark, qrows, drows, k=4, scale=8, d=6)
    assert got == _np_maxsim(qrows, drows, 4, 8, 6)


def test_tie_breaks_to_smaller_doc_id(spark):
    # two docs with identical token sets -> identical scores; the
    # smaller doc_id must take the better rank deterministically.
    v = [1.0, 0.5]
    qrows = [(0, 0, v)]
    drows = [(9, 0, v), (4, 0, v), (7, 0, [0.0, 0.0])]
    _, got = _spark_maxsim(spark, qrows, drows, k=3, scale=64, d=2)
    ranks = {doc: rank for (_, rank, doc, _) in got}
    assert ranks[4] == 1 and ranks[9] == 2 and ranks[7] == 3


def test_query_side_broadcasts(spark):
    rng = random.Random(5)
    qrows = _mk(rng, 1, 2, 4)
    drows = _mk(rng, 10, 3, 4, id0=10)
    res, _ = _spark_maxsim(spark, qrows, drows, k=3, scale=64, d=4)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan  # query tokens ship to the doc side
