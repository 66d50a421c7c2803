"""Product quantization ANN (link/pq.py)."""

from __future__ import annotations

import numpy as np

from spanluke_spark.link.pq import pq_adc_topk, pq_train_encode


def _toy(spark, n=40, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    vecs = rng.randn(n, dim).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        vecs.astype("float64"),
    )


def test_codebook_and_code_shapes(spark):
    emb, _ = _toy(spark)
    books, codes = pq_train_encode(emb, n_sub=2, k=4, iters=1, sub_dim=4)
    b = books.collect()
    assert {(r.sub) for r in b} == {0, 1}
    assert all(0 <= r.cid < 4 for r in b)
    assert len(b) == 2 * 4 * 4  # sub x cid x spos
    c = codes.collect()
    assert len(c) == 40 * 2  # one code per vector per subspace
    assert all(0 <= r.cid < 4 for r in c)


def test_adc_matches_numpy_replay(spark):
    emb, vecs = _toy(spark)
    books, codes = pq_train_encode(emb, n_sub=2, k=4, iters=1, sub_dim=4)
    got = pq_adc_topk(emb, books, codes, query_id=0, topk=5, sub_dim=4).collect()

    # numpy replay: rebuild centroids from the returned codebooks, compute
    # ADC with the same round-6 convention
    cb = {}
    for r in books.collect():
        cb.setdefault((r.sub, r.cid), np.zeros(4))[r.spos] = r.c
    code_map = {}
    for r in codes.collect():
        code_map.setdefault(r.vid, {})[r.sub] = r.cid
    q = vecs[0]
    adc = {}
    for vid, cm in code_map.items():
        d = 0.0
        for sub in (0, 1):
            cent = cb[(sub, cm[sub])]
            qs = q[sub * 4 : (sub + 1) * 4]
            d += round(float(((cent - qs) ** 2).sum()), 6)
        adc[vid] = round(d, 6)
    order = sorted(adc, key=lambda v: (adc[v], v))[:5]
    assert [r.vec_id for r in got] == order
    for r in got:
        assert abs(r.adc_d2 - adc[r.vec_id]) < 1e-9


def test_adc_approximates_exact_ranking(spark):
    emb, vecs = _toy(spark, n=60)
    books, codes = pq_train_encode(emb, n_sub=2, k=8, iters=2, sub_dim=4)
    got = pq_adc_topk(emb, books, codes, query_id=3, topk=10, sub_dim=4).collect()
    # query itself must be the ADC top-1 (its cell centroids are closest)
    assert got[0].vec_id == 3
    # exact_d2 column is the true distance
    q = vecs[3]
    for r in got:
        true = round(float(((vecs[r.vec_id] - q) ** 2).sum()), 6)
        assert abs(r.exact_d2 - true) < 1e-6
    # ADC distances correlate with exact ones (monotone-ish sanity)
    exact_top = sorted(
        range(60), key=lambda v: float(((vecs[v] - q) ** 2).sum())
    )[:10]
    overlap = len({r.vec_id for r in got} & set(exact_top))
    assert overlap >= 3
