"""Bitext mining over int8-quantized embeddings."""

from __future__ import annotations

import numpy as np
import pytest

from spanluke_spark.textops.bitext import mine_bitext


def _fixture(spark):
    # vec 0/1: near-identical direction, different lang -> accept
    # vec 0/2: same lang -> reject;  0/3: orthogonal -> reject
    # 0/4: similar but 5x length mismatch -> reject
    vecs = [
        (0, [1.0, 0.1, 0.0]),
        (1, [0.98, 0.12, 0.01]),
        (2, [1.0, 0.1, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [0.97, 0.11, 0.0]),
    ]
    docs = [
        (0, "en", 100), (1, "de", 120), (2, "en", 100),
        (3, "de", 100), (4, "de", 500),
    ]
    cands = [(0, 1), (0, 2), (0, 3), (0, 4)]
    return (
        spark.createDataFrame(docs, "doc_id long, lang string, n_chars long"),
        spark.createDataFrame(vecs, "vec_id long, embedding array<float>"),
        spark.createDataFrame(cands, "id_a long, id_b long"),
    )


def test_bitext_gates(spark):
    docs, emb, cands = _fixture(spark)
    out = mine_bitext(docs, emb, cands, threshold=0.9).collect()
    assert [(r.id_a, r.id_b, r.lang_a, r.lang_b) for r in out] == [
        (0, 1, "en", "de")
    ]
    assert out[0].sim > 0.99


def test_bitext_int8_sim_tracks_float_cosine(spark):
    docs, emb, cands = _fixture(spark)
    out = {(r.id_a, r.id_b): r.sim
           for r in mine_bitext(docs, emb, cands, threshold=-1.0,
                                max_length_ratio=100.0).collect()}
    vecs = {0: [1.0, 0.1, 0.0], 1: [0.98, 0.12, 0.01],
            3: [0.0, 0.0, 1.0], 4: [0.97, 0.11, 0.0]}
    for (a, b), got in out.items():
        x, y = np.array(vecs[a]), np.array(vecs[b])
        ref = x @ y / (np.linalg.norm(x) * np.linalg.norm(y))
        assert got == pytest.approx(ref, abs=2e-2)  # int8 tracks float
