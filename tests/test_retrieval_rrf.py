"""RRF gates (textops/retrieval.py rrf_fuse): Python replay parity,
absence handling (no outer-join NULLs), k sensitivity, and the
deterministic tie-break.
"""

from spanluke_spark.textops.retrieval import rrf_fuse


def _rank_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


def ref_rrf(lists, k=60):
    scores = {}
    for lst in lists:
        for doc, r in lst:
            scores[doc] = scores.get(doc, 0.0) + 1.0 / (k + r)
    order = sorted(scores.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))
    return {doc: (round(s, 6), i + 1) for i, (doc, s) in enumerate(order)}


def test_rrf_parity_and_absence(spark):
    l1 = [(1, 1), (2, 2), (3, 3)]
    l2 = [(3, 1), (4, 2)]          # doc 4 absent from l1, docs 1/2 from l2
    got = {r.doc_id: (r.rrf_score, r.fused_rank)
           for r in rrf_fuse([_rank_df(spark, l1), _rank_df(spark, l2)]).collect()}
    assert got == ref_rrf([l1, l2])
    # doc 3 (ranked in both) must fuse above doc 1 (top of one list only)
    assert got[3][1] < got[1][1]


def test_rrf_k_and_tiebreak(spark):
    l1 = [(10, 1), (20, 1)]        # identical scores -> id asc
    got = {r.doc_id: r.fused_rank
           for r in rrf_fuse([_rank_df(spark, l1)], k=10).collect()}
    assert got == {10: 1, 20: 2}


def test_rrf_empty_input_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])
