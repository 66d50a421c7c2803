"""Unigram LM quality scoring — the CCNet-style "perplexity filter" stand-in
(Wenzek et al. 2020 score documents with a KenLM model; with no model files
in this sandbox, the LM is a corpus-trained unigram with additive smoothing).

Two-pass, fully lazy, broadcast-shaped:
  pass 1: word -> count (one shuffle with map-side partial agg; the vocab is
          tiny relative to the corpus at any scale),
  pass 2: explode + broadcast-join the vocab + per-doc mean bits/token
          (one shuffle keyed by doc id).
No driver actions, no Python rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """(id, n_tokens, bits_per_token): mean -log2 p(w) under the corpus
    unigram LM with add-k smoothing over V+1 outcomes (unseen mass finite).
    High bits_per_token = improbable text (gibberish / wrong language);
    low = repetitive/templated — both ends are curation-filter targets.

    ``broadcast_vocab``: a curated vocab (cap via min-count or top-N before
    calling) broadcasts fine; the RAW web vocab at 10^12 docs is
    100M+ distinct tokens — pass False there and the score join becomes an
    ordinary shuffle join on the word key (both sides already exploded)."""
    words = df.select(F.col(id_col).alias("id"), F.explode(F.split(F.col(text_col), " ")).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    denom = F.col("total") + F.lit(k) * (F.col("v") + 1)
    bits = -F.log2((F.col("c") + F.lit(k)) / denom)
    vocab_side = F.broadcast(vocab) if broadcast_vocab else vocab
    return (
        words.join(vocab_side, "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(bits), 6).alias("bits_per_token"),
        )
        .withColumnRenamed("id", id_col)
    )


def bigram_lm_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    k: float = 0.5,
    alpha: float = 0.4,
    broadcast_model: bool = True,
) -> DataFrame:
    """Bigram LM with STUPID BACKOFF (Brants et al. 2007) — one rung
    closer to CCNet's KenLM filter than the unigram: (id, n_tokens,
    bits_per_token) where token 0 scores under the smoothed unigram and
    token i>0 under count(w_{i-1} w_i)/count(w_{i-1}·) when that bigram
    was seen in the TRAINING corpus, else alpha * p_unigram(w_i).

    ``train_df`` (default: ``df`` itself) fixes the counting corpus —
    pass the reference corpus to score new crawls against it; self-
    training never triggers the backoff (every bigram is seen), which is
    exactly the unigram module's relative-quality semantics.

    Shape: two count aggregates over the training corpus (map-side
    partial) + one broadcast (or shuffle, ``broadcast_model=False`` for
    raw-web vocabularies) join per table; no Python rows anywhere."""
    src = train_df if train_df is not None else df
    toks = lambda frame: frame.withColumn("_t", F.split(F.col(text_col), " "))  # noqa: E731

    train_words = src.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
    vocab = train_words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stats = vocab.agg(F.sum("c").alias("total"), F.count(F.lit(1)).alias("v"))
    big = (
        toks(src)
        .select(
            F.explode(
                # guard: sequence(1, 0) DESCENDS in Spark, so single-token
                # docs must yield an empty pair list, not garbage indices
                F.expr(
                    "CASE WHEN size(_t) >= 2 THEN"
                    " transform(sequence(1, size(_t) - 1),"
                    " i -> struct(_t[i-1] AS a, _t[i] AS b))"
                    " ELSE array() END"
                )
            ).alias("_p")
        )
        .select("_p.a", "_p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = big.groupBy("a").agg(F.sum("cb").alias("ca"))
    maybe_b = F.broadcast if broadcast_model else (lambda x: x)

    uni_denom = F.col("total") + F.lit(k) * (F.col("v") + 1)
    uni_bits = -F.log2((F.coalesce(F.col("c"), F.lit(0)) + F.lit(k)) / uni_denom)

    first = (
        toks(df)
        .select(F.col(id_col).alias("id"), F.col("_t")[0].alias("w"))
        .join(maybe_b(vocab), "w", "left")
        .crossJoin(F.broadcast(stats))
        .select("id", uni_bits.alias("bits"))
    )
    rest = (
        toks(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                # guard: sequence(1, 0) DESCENDS in Spark, so single-token
                # docs must yield an empty pair list, not garbage indices
                F.expr(
                    "CASE WHEN size(_t) >= 2 THEN"
                    " transform(sequence(1, size(_t) - 1),"
                    " i -> struct(_t[i-1] AS a, _t[i] AS b))"
                    " ELSE array() END"
                )
            ).alias("_p"),
        )
        .select("id", "_p.a", "_p.b")
        .join(maybe_b(big), ["a", "b"], "left")
        .join(maybe_b(ctx), "a", "left")
        .join(
            maybe_b(vocab.select(F.col("w").alias("b"), "c")), "b", "left"
        )
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            F.when(
                F.col("cb").isNotNull(), -F.log2(F.col("cb") / F.col("ca"))
            )
            .otherwise(-F.log2(F.lit(alpha)) + uni_bits)
            .alias("bits"),
        )
    )
    return (
        first.unionByName(rest)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("bits"), 6).alias("bits_per_token"),
        )
        .withColumnRenamed("id", id_col)
    )


def kneser_ney_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_df: DataFrame | None = None,
    discount: float = 0.75,
    k: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    Goodman 1999 eq. 4.27) — the smoothing KenLM itself uses, one rung
    above stupid backoff: (id, n_tokens, bits_per_token) where

      P(b|a) = max(c(ab) - D, 0)/c(a.) + D * N1+(a.)/c(a.) * Pcont(b)

    with continuation probability Pcont(b) = (N1+(.b) + k)/(N + k(V+1))
    over N distinct bigram types and V vocabulary words (the add-k floor
    covers words never seen as a continuation and OOV — a deviation from
    the textbook formula, which leaves them at zero and -inf bits; same
    smoothing constant the unigram module uses). First tokens and tokens
    after an UNSEEN context both score under Pcont alone.

    ``train_df`` (default: ``df``) fixes the counting corpus; self-
    training never takes the unseen-context branch, which is what the
    oracle replays — the train-on-A-score-on-B pytest drives every
    branch. Shape: three count aggregates over the training corpus with
    map-side partials, one broadcast (or shuffle) join per model table
    keyed on the token; no Python rows anywhere.
    """
    src = train_df if train_df is not None else df
    toks = lambda frame: frame.withColumn(  # noqa: E731
        "_t", F.split(F.col(text_col), " ")
    )
    pairs_expr = F.expr(
        "CASE WHEN size(_t) >= 2 THEN"
        " transform(sequence(1, size(_t) - 1),"
        " i -> struct(_t[i-1] AS a, _t[i] AS b))"
        " ELSE array() END"
    )

    vocab = src.select(
        F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    big = (
        toks(src)
        .select(F.explode(pairs_expr).alias("_p"))
        .select("_p.a", "_p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = big.groupBy("a").agg(
        F.sum("cb").alias("ca"), F.count(F.lit(1)).alias("n1f")
    )
    cont = big.groupBy("b").agg(F.count(F.lit(1)).alias("n1r"))
    stats = big.agg(F.count(F.lit(1)).alias("nbig")).crossJoin(
        F.broadcast(vocab.agg(F.count(F.lit(1)).alias("v")))
    )
    maybe_b = F.broadcast if broadcast_model else (lambda x: x)

    d = F.lit(float(discount))
    pcont = (F.coalesce(F.col("n1r"), F.lit(0)) + F.lit(k)) / (
        F.col("nbig") + F.lit(k) * (F.col("v") + 1)
    )
    first = (
        toks(df)
        .select(F.col(id_col).alias("id"), F.col("_t")[0].alias("b"))
        .join(maybe_b(cont), "b", "left")
        .crossJoin(F.broadcast(stats))
        .select("id", (-F.log2(pcont)).alias("bits"))
    )
    p_kn = F.when(
        F.col("ca").isNotNull(),
        F.greatest(F.coalesce(F.col("cb"), F.lit(0)) - d, F.lit(0.0))
        / F.col("ca")
        + d * F.col("n1f") / F.col("ca") * pcont,
    ).otherwise(pcont)
    rest = (
        toks(df)
        .select(F.col(id_col).alias("id"), F.explode(pairs_expr).alias("_p"))
        .select("id", "_p.a", "_p.b")
        .join(maybe_b(big), ["a", "b"], "left")
        .join(maybe_b(ctx), "a", "left")
        .join(maybe_b(cont), "b", "left")
        .crossJoin(F.broadcast(stats))
        .select("id", (-F.log2(p_kn)).alias("bits"))
    )
    return (
        first.unionByName(rest)
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("bits"), 6).alias("bits_per_token"),
        )
        .withColumnRenamed("id", id_col)
    )
