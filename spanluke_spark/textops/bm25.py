"""Inverted index + BM25 retrieval over the documents table — the standard
web-corpus relevance primitive (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") and the retrieval half of every
quality-by-query curation loop (e.g. pulling in-domain documents for a
training mixture by scoring the corpus against seed queries).

Scale shape (the part that must survive 10^12 pages):

- the postings build is ONE shuffle keyed on (doc_id is already unique, so
  tf per (term, doc) is a map-side-combinable groupBy after an explode) —
  no Python, all codegen `split`/`explode`;
- per-term document frequency is a second map-side-combinable agg over the
  postings, keyed on the term (vocab-sized output, tiny vs the corpus);
- the query set is assumed small (seed queries, not the corpus) and is
  BROADCAST onto the postings — the 10^12-row postings side never
  shuffles for the join, and the term semi-join prunes every posting list
  whose term appears in no query before any scoring work happens;
- corpus constants (N, avgdl) ride in via a 1-row broadcast crossJoin
  (same pattern as tfidf.py / lm_score.py);
- top-k per query is a WindowGroupLimit partial top-k (rank pushed below
  the shuffle), never a global sort.

No RNG anywhere; scores are deterministic doubles, so the DuckDB oracle
replays the exact formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "terms_of",
    "build_postings",
    "bm25_topk",
    "bm25_scores",
    "corpus_consts",
]


def terms_of(text: Column) -> Column:
    """Lower-cased alphanumeric terms of ``text`` (array<string>).

    Split on runs of non-alphanumerics so punctuation never mints tokens;
    pure codegen, fuses into the scan.
    """
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (term, doc_id, tf, dl): the inverted index as a relation.

    One explode + one map-side-combinable groupBy; ``dl`` (document length
    in terms) is carried on every posting so scoring never re-joins the
    document table.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        terms_of(F.col(text_col)).alias("terms"),
    ).select("doc_id", F.size("terms").alias("dl"), F.explode("terms").alias("term"))
    return toks.groupBy("term", "doc_id", "dl").agg(F.count("*").alias("tf"))


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document against every query by BM25; keep the top-k
    docs per query.

    ``queries`` is (query_id, query_text) and is broadcast — it is the seed
    set, assumed tiny relative to the corpus. Returns
    (query_id, doc_id, score, rank) with rank 1..topk ordered by
    (round(score, 6) DESC, doc_id) — the rounding makes the tie-break
    engine-portable (two engines summing the same per-term doubles in a
    different order agree after 1e-6 rounding).

    idf uses the +1 "Lucene" form ``ln(1 + (N - df + 0.5) / (df + 0.5))``
    which is non-negative for all df, so stop-terms degrade gracefully
    instead of flipping sign.
    """
    postings = build_postings(docs, id_col=id_col, text_col=text_col)

    qterms = (
        queries.select(
            "query_id", F.explode(terms_of(F.col("query_text"))).alias("term")
        )
        # duplicate terms in one query score once per occurrence in classic
        # BM25 only via query tf; keep the simple distinct form (qtf=1),
        # the norm used by Lucene's default similarity.
        .distinct()
    )
    consts = corpus_consts(docs, text_col=text_col)
    scored = bm25_scores(postings, qterms, consts, k1=k1, b=b)

    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score", "rank")
    )


def corpus_consts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """1-row (n_docs, avgdl) — the corpus constants BM25 needs; rides
    into scoring via a broadcast crossJoin (tfidf.py/lm_score.py
    pattern)."""
    return docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        (
            F.sum(F.size(terms_of(F.col(text_col)))).cast("double")
            / F.count("*")
        ).alias("avgdl"),
    )


def bm25_scores(
    postings: DataFrame,
    qterms: DataFrame,
    consts: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(query_id, doc_id, score): BM25 over an explicit (query_id, term)
    relation — the scoring core shared by bm25_topk and the PRF second
    pass (textops/prf.py), where the query is a TERM SET (original +
    expansion terms), not a text string.

    Document frequency is computed ONLY for query terms (the full-vocab
    df relation would be 10^8 rows at web scale — too big to broadcast);
    the broadcast semi-join prunes the 10^12-row postings side before
    any arithmetic, and scores round to 1e-6 so downstream tie-breaks
    are engine-portable."""
    df_by_term = (
        postings.join(
            F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    return (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_by_term), "term")
        .crossJoin(F.broadcast(consts))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )


def ql_dirichlet_topk(
    docs: DataFrame,
    queries: DataFrame,
    topk: int = 10,
    mu: float = 100.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet prior smoothing (Zhai &
    Lafferty, SIGIR 2001) — the language-modeling counterpart to BM25
    and the stronger baseline on short queries:

      score(q, d) = sum over distinct query terms w of
                    ln((tf(w,d) + mu * cf(w)/|C|) / (dl_d + mu))

    Candidates are documents matching >= 1 query term (the standard
    index-driven candidate rule); unmatched query terms still contribute
    their smoothing-only mass, which is why dl matters even at tf = 0.
    Query terms absent from the ENTIRE collection are dropped (cf = 0
    would send every score to -inf and rank nothing).

    Scale shape mirrors bm25_topk: collection frequencies only for query
    terms (broadcast semi-join prunes the postings first), candidates
    from one broadcast term join, then the per-(candidate, query-term)
    matrix is |candidates| x |query terms| — never corpus-sized. Scores
    round to 1e-6 for the engine-portable tie-break.
    """
    postings = build_postings(docs, id_col=id_col, text_col=text_col)
    qterms = queries.select(
        "query_id", F.explode(terms_of(F.col("query_text"))).alias("term")
    ).distinct()
    ctot = postings.agg(F.sum("tf").cast("double").alias("ctot"))
    cf = (
        postings.join(
            F.broadcast(qterms.select("term").distinct()), "term", "left_semi"
        )
        .groupBy("term")
        .agg(F.sum("tf").cast("double").alias("cf"))
    )
    # inner join: collection-absent query terms drop; cf is |query terms|
    # rows — broadcast so the join never shuffles
    qt = qterms.join(F.broadcast(cf), "term")
    cand = (
        postings.join(F.broadcast(qt.select("term").distinct()), "term", "left_semi")
        .join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", "dl")
        .distinct()
    )
    tf_rel = postings.select("term", "doc_id", "tf")
    scored = (
        cand.join(F.broadcast(qt), "query_id")
        .join(tf_rel, ["term", "doc_id"], "left")
        .crossJoin(F.broadcast(ctot))
        .withColumn(
            "_c",
            F.log(
                (
                    F.coalesce(F.col("tf"), F.lit(0)).cast("double")
                    + F.lit(mu) * F.col("cf") / F.col("ctot")
                )
                / (F.col("dl") + F.lit(mu))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("_c"), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "doc_id", "score", "rank")
    )
