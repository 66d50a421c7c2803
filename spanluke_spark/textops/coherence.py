"""UMass topic coherence (Mimno et al. 2011) — do a topic's top
words actually CO-OCCUR in documents, or did the topic model stitch
together frequency artifacts? The intrinsic (no external corpus)
topic QA beside the topics/TF-IDF lanes:

  C(topic) = sum_{i=2..k} sum_{j<i} ln( (D(w_i, w_j) + 1) / D(w_j) )

with D document frequencies and the +1 smoothing from the paper; the
word order is the topic's own rank order, so the conditioning word
w_j is always the more-probable one.

Exactness discipline: each pair cell is once-quantized to
round-ln-ppm on INTEGER arguments (D(wi,wj) + 1 vs D(wj) — q307
discipline), the per-topic sum is exact, and the mean-per-pair is
one sign-split trunc division. Pairs whose conditioning word never
occurs (D(w_j) = 0, coherence undefined) are SKIPPED and counted in
``n_undefined`` rather than silently zeroed. A topic of always-
co-occurring words scores exactly sum ln((D+1)/D) > 0; disjoint
words score k-choose-2 cells of ln(1/D) < 0.

Distributed shape: the topic vocabulary is configuration-sized —
one broadcast filter to the incidence table (DISTINCT doc x word),
one self-join on doc restricted to in-topic ordered pairs, one
(topic, pair) aggregate, one (topic) aggregate. Corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["umass_coherence"]


def umass_coherence(
    docs: DataFrame,
    topics: dict[int, list[str]],
    doc_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """docs(doc_id, token) occurrences x topics {id: [w1..wk] in rank
    order} -> per topic (topic_id, n_pairs, n_undefined, coh_num,
    mean_pair_ppm)."""
    spark = docs.sparkSession
    vocab = sorted({w for ws in topics.values() for w in ws})
    inc = (
        docs.select(
            F.col(doc_col).alias("doc"), F.col(token_col).alias("w")
        )
        .where(F.col("w").isin(vocab))
        .distinct()
    )
    dfreq = inc.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("d"))

    pair_rows = [
        (tid, ws[i], ws[j])
        for tid, ws in topics.items()
        for i in range(1, len(ws))
        for j in range(i)
    ]
    pairs = spark.createDataFrame(
        pair_rows, "topic_id long, wi string, wj string"
    )
    co = (
        inc.alias("a")
        .join(inc.alias("b"), F.col("a.doc") == F.col("b.doc"))
        .select(F.col("a.w").alias("wi"), F.col("b.w").alias("wj"))
        .join(F.broadcast(pairs), ["wi", "wj"])
        .groupBy("topic_id", "wi", "wj")
        .agg(F.count(F.lit(1)).cast("long").alias("dij"))
    )
    cells = (
        pairs.join(co, ["topic_id", "wi", "wj"], "left")
        .join(F.broadcast(dfreq.withColumnRenamed("w", "wj")), "wj", "left")
        .select(
            "topic_id",
            F.coalesce(F.col("dij"), F.lit(0).cast("long")).alias("dij"),
            F.coalesce(F.col("d"), F.lit(0).cast("long")).alias("dj"),
        )
    )
    lncell = F.round(
        F.log((F.col("dij") + 1) / F.col("dj")) * 1_000_000
    ).cast("long")
    agg = cells.groupBy("topic_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum(F.when(F.col("dj") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_undefined"),
        F.sum(F.when(F.col("dj") > 0, lncell)).alias("coh_num"),
    )
    x = agg.select(
        "topic_id",
        (F.col("n_cells") - F.col("n_undefined")).alias("n_pairs"),
        "n_undefined",
        F.coalesce(F.col("coh_num"), F.lit(0).cast("long")).alias(
            "coh_num"
        ),
    )
    mag = F.expr("abs(coh_num) div n_pairs")
    return x.select(
        "topic_id",
        "n_pairs",
        "n_undefined",
        "coh_num",
        F.when(
            F.col("n_pairs") > 0,
            F.when(F.col("coh_num") < 0, -mag).otherwise(mag),
        ).alias("mean_pair_ppm"),
    )
