"""Hybrid retrieval: recall stage gates the rerank, rerank reorders,
missing embeddings drop, and the candidate join stays candidate-sized."""

from __future__ import annotations

from spanluke_spark.textops.retrieval import hybrid_search


def _fixture(spark):
    docs = spark.createDataFrame(
        [
            (0, "hash join probe build"),
            (1, "hash join spill"),
            (2, "hash hash hash join join"),
            (3, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.7, 0.7]),
            (100, [0.1, 1.0]),  # the query vector: closest to doc 1
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame([(1, "hash join")], "query_id int, query_text string")
    qvecs = emb.where("vec_id = 100").selectExpr("1 as query_id", "embedding")
    return docs, queries, emb, qvecs


def test_rerank_reorders_bm25_candidates(spark):
    docs, queries, emb, qvecs = _fixture(spark)
    rows = hybrid_search(docs, queries, emb, qvecs, recall_k=3, final_k=3).collect()
    ranked = [r.doc_id for r in sorted(rows, key=lambda r: r.rank)]
    # BM25 alone would put the keyword-stuffed doc 2 first; the query
    # vector points at doc 1
    assert ranked[0] == 1
    assert set(ranked) <= {0, 1, 2}  # doc 3 never recalled (no query term)


def test_recall_stage_caps_candidates(spark):
    docs, queries, emb, qvecs = _fixture(spark)
    rows = hybrid_search(docs, queries, emb, qvecs, recall_k=1, final_k=10).collect()
    assert len(rows) == 1  # only the single BM25 winner reaches rerank


def test_missing_embedding_drops_candidate(spark):
    docs, queries, emb, qvecs = _fixture(spark)
    emb_missing = emb.where("vec_id <> 2")
    rows = hybrid_search(docs, queries, emb_missing, qvecs, recall_k=3, final_k=3).collect()
    assert {r.doc_id for r in rows} == {0, 1}
