"""Multinomial Naive Bayes text classifier (train + score) — the
generative sibling of the kNN vote (q253) and the quality-gate scorers
(lm_score, ql_dirichlet): the classic fastText-before-fastText crawl
classifier (language, domain, spam) that trains in ONE aggregation
pass and scores with ONE broadcast join, which is why it is the
default first gate over 10^12 pages.

Train (add-one smoothing, McCallum & Nigam 1998 multinomial event
model): per-class token counts c(k,w), class token totals T(k), doc
priors D(k), vocab size V = |distinct train tokens|. Every
log-likelihood is quantized ONCE per (class, token) to round(ln(p) *
10^6) as a BIGINT, so document scores are INTEGER sums — order-free,
bit-identical in SQL, no float-accumulation drift.

score(d, k) = prior_ppm(k) + sum_w n_w(d) * tok_ppm(k, w)
tok_ppm(k, w) = round(ln((c(k,w) + 1) / (T(k) + V)) * 10^6)
(unseen-in-class and unseen-in-train tokens both fall back to c = 0).

Distributed shape: training is explode + groupBy (combinable, one
shuffle, output = V*K rows — model-sized, not corpus-sized). Scoring
explodes test docs to (doc, token, n) term counts, broadcast-joins the
V*K model (crossJoin of a K-row class dim with per-token counts,
left-coalesced to the smoothing floor), and reduces with one
groupBy(doc, class) + a K-row-per-doc window for the argmax —
corpus-linear, model broadcast, no corpus-sized shuffle beyond the
term-count groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["nb_train", "nb_classify"]

PPM = 1_000_000


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("w"),
    )


def nb_train(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """-> (model, priors). model: (k, w, tok_ppm, zero_ppm) one row per
    (class, train-vocab token), where zero_ppm is the class's c=0
    smoothing floor (also the score of any unseen token); priors:
    (k, prior_ppm). Both are model-sized — broadcast them."""
    toks = _tokens(train, id_col, text_col).join(
        train.select(
            F.col(id_col).alias("id"), F.col(label_col).alias("k")
        ),
        "id",
    )
    ckw = toks.groupBy("k", "w").agg(F.count(F.lit(1)).alias("c"))
    vocab = toks.select("w").distinct()
    v = vocab.count()
    totals = ckw.groupBy("k").agg(F.sum("c").alias("t"))
    # dense (class x vocab) grid so every class scores every train token
    grid = totals.crossJoin(F.broadcast(vocab))
    model = (
        grid.join(ckw, ["k", "w"], "left")
        .select(
            "k",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1)
                    / (F.col("t") + F.lit(v))
                )
                * PPM
            ).cast("long").alias("tok_ppm"),
            F.round(F.log(1 / (F.col("t") + F.lit(v))) * PPM)
            .cast("long")
            .alias("zero_ppm"),
        )
    )
    n_docs = train.count()
    priors = (
        train.groupBy(F.col(label_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("d"))
        .select(
            "k",
            F.round(F.log(F.col("d") / F.lit(n_docs)) * PPM)
            .cast("long")
            .alias("prior_ppm"),
        )
    )
    return model, priors


def nb_classify(
    test: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
) -> DataFrame:
    """-> (id, pred, score_ppm): the argmax class per test doc (ties
    broken by class name ascending). Unseen-in-train tokens contribute
    each class's zero_ppm floor."""
    terms = (
        _tokens(test, id_col, text_col)
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    zeros = model.select("k", "zero_ppm").distinct()
    scored = (
        terms.crossJoin(F.broadcast(zeros))
        .join(F.broadcast(model.select("k", "w", "tok_ppm")), ["k", "w"], "left")
        .groupBy("id", "k")
        .agg(
            F.sum(
                F.col("n")
                * F.coalesce(F.col("tok_ppm"), F.col("zero_ppm"))
            ).alias("tok_sum")
        )
        .join(F.broadcast(priors), "k")
        .select(
            "id",
            "k",
            (F.col("tok_sum") + F.col("prior_ppm")).alias("score_ppm"),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score_ppm").desc(), F.col("k").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", F.col("k").alias("pred"), "score_ppm")
    )
