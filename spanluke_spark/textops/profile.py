"""Key-distribution profiling: the skew dashboard for shuffle planning.

Every operator in this engine that shuffles on a content key (dedup
buckets, CC stars, host aggregates, entity joins) has a skew story; this
is the op that MEASURES the skew before you pick one. Output: the top-K
heaviest keys with their share of rows and their multiple of the mean
key load — the two numbers that decide between plain hash join, AQE skew
split, and explicit salting.

Scale shape: one count aggregate (map-side combined), then top-K via
``orderBy().limit(k)`` — Spark plans that as TakeOrderedAndProject (a
per-partition heap + driver merge of K rows), NOT a global sort or a
single-partition window. The corpus-wide denominators ride a 1-row
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """-> (rank, key, n, share, x_mean): the ``top_k`` heaviest values of
    ``key_col`` (count desc, key asc tie-break), each with its fraction
    of all rows and its ratio to the mean per-key count."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    # the window below runs over <= top_k rows (already reduced) — bounded
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n",
            (F.col("n") / F.col("_total")).alias("share"),
            (F.col("n") * F.col("_keys") / F.col("_total")).alias("x_mean"),
        )
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary -> one row
    (slope, intercept, n_terms, n_tokens, n_freq_classes): weighted
    least squares of ln(freq) on ln(rank). Natural text sits near
    slope -1; a corpus that drifts far off is a red flag (boilerplate
    floods, spam, synthetic text) — the curation dashboard number.

    Scale shape: per-term ranking of a 10^8-term vocabulary would need a
    global sort, so the fit instead aggregates the FREQUENCY SPECTRUM —
    every term with the same frequency shares a rank class whose
    representative is the class midpoint, weighted by class size. The
    only window runs over distinct frequency VALUES (thousands, not the
    vocabulary), everything else is hash aggregates: explode -> term
    counts -> spectrum -> cumulative rank -> 5 weighted sums.
    """
    terms = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("term")
    ).where(F.col("term") != "")
    tf = terms.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    spectrum = tf.groupBy("freq").agg(F.count(F.lit(1)).alias("n_terms"))
    w = Window.orderBy(F.desc("freq")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = spectrum.withColumn("cum", F.sum("n_terms").over(w)).select(
        "freq",
        "n_terms",
        # midpoint of the class's [cum - n_terms + 1, cum] rank run
        ((F.col("cum") - F.col("n_terms") + 1 + F.col("cum")) / 2.0).alias(
            "midrank"
        ),
    )
    x = F.log("midrank")
    y = F.log("freq")
    n = F.col("n_terms")
    sums = ranked.agg(
        F.sum(n).alias("sw"),
        F.sum(n * x).alias("sx"),
        F.sum(n * y).alias("sy"),
        F.sum(n * x * x).alias("sxx"),
        F.sum(n * x * y).alias("sxy"),
        F.sum(F.col("freq") * n).alias("n_tokens"),
        F.count(F.lit(1)).alias("n_freq_classes"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("sw")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("sw")
    )
    return sums.select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("sw")).alias(
            "intercept"
        ),
        F.col("sw").alias("n_terms"),
        "n_tokens",
        "n_freq_classes",
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flags by Median Absolute Deviation —
    the host-metrics anomaly rule (a crawler watching bytes/page or
    latency per host wants flags that one legitimate 100 MB page cannot
    move, which rules mean/stddev out): flag rows with
    |x - median| > k * MAD.

    -> input columns + (med, mad, is_outlier). Exact medians (two
    map-side-combinable percentile aggs keyed on the group — never a
    global sort); an all-identical group has MAD 0, so any deviation
    flags, the conventional degenerate-case reading.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(med, group_col)
    mad = (
        with_med.withColumn("_dev", F.abs(F.col(value_col) - F.col("med")))
        .groupBy(group_col)
        .agg(F.expr("percentile(_dev, 0.5)").alias("mad"))
    )
    return (
        with_med.join(mad, group_col)
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("med")) > k * F.col("mad"),
        )
        .withColumn("med", F.round("med", 6))
        .withColumn("mad", F.round("mad", 6))
    )
