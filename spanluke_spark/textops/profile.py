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

from pyspark.sql import Column, DataFrame, Window
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


def missing_mass(
    df: DataFrame, text_col: str = "text", group_col: str | None = None
) -> DataFrame:
    """Good-Turing missing-mass estimate: P(next token is UNSEEN) =
    singletons / total tokens (Good 1953) — the corpus-coverage dial for
    "have we crawled enough of this language/domain yet", plus the
    frequency-of-frequencies head (n1, n2) that simple Good-Turing
    smoothing consumes.

    -> [group_col,] n_tokens, vocab, n1, n2, p_unseen (round 6). Two
    map-side-combinable aggs (token counts, then counts-of-counts);
    nothing driver-side.
    """
    from .bm25 import terms_of

    keys = [group_col] if group_col else []
    toks = df.select(
        *keys, F.explode(terms_of(F.col(text_col))).alias("term")
    )
    counts = toks.groupBy(*keys, "term").agg(F.count("*").alias("c"))
    return (
        counts.groupBy(*keys)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("vocab"),
            F.sum((F.col("c") == 1).cast("long")).alias("n1"),
            F.sum((F.col("c") == 2).cast("long")).alias("n2"),
        )
        .withColumn(
            "p_unseen",
            F.round(F.col("n1") / F.col("n_tokens"), 6),
        )
    )


def log_odds_ratio(
    df: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
    alpha: float = 0.01,
    min_count: int = 5,
) -> DataFrame:
    """Which words DISTINGUISH corpus slice A from slice B — weighted
    log-odds-ratio with an informative Dirichlet prior and its z-score
    (Monroe, Colaresi & Quinn 2008, "Fightin' Words"): the principled
    replacement for raw tf-idf deltas when comparing sources, languages
    or time slices before mixing them.

    delta = ln((y_aw + a_w)/(n_a + a0 - y_aw - a_w))
          - ln((y_bw + a_w)/(n_b + a0 - y_bw - a_w));
    var = 1/(y_aw + a_w) + 1/(y_bw + a_w); z = delta/sqrt(var), with the
    prior a_w = alpha * corpus count of w (a0 = alpha * corpus total).
    -> (term, cnt_a, cnt_b, delta, z), terms below min_count total
    dropped. All aggregates map-side combinable; the final arithmetic is
    a projection.
    """
    from .bm25 import terms_of

    toks = df.where(F.col(group_col).isin([group_a, group_b])).select(
        F.col(group_col).alias("g"),
        F.explode(terms_of(F.col(text_col))).alias("term"),
    )
    counts = (
        toks.groupBy("term")
        .agg(
            F.sum((F.col("g") == group_a).cast("long")).alias("cnt_a"),
            F.sum((F.col("g") == group_b).cast("long")).alias("cnt_b"),
        )
        .where(F.col("cnt_a") + F.col("cnt_b") >= min_count)
    )
    tot = counts.agg(
        F.sum("cnt_a").alias("n_a"),
        F.sum("cnt_b").alias("n_b"),
        F.sum(F.col("cnt_a") + F.col("cnt_b")).alias("n_all"),
    )
    w = counts.crossJoin(F.broadcast(tot)).withColumn(
        "a_w", alpha * (F.col("cnt_a") + F.col("cnt_b"))
    ).withColumn("a0", alpha * F.col("n_all"))
    delta = (
        F.log(
            (F.col("cnt_a") + F.col("a_w"))
            / (F.col("n_a") + F.col("a0") - F.col("cnt_a") - F.col("a_w"))
        )
        - F.log(
            (F.col("cnt_b") + F.col("a_w"))
            / (F.col("n_b") + F.col("a0") - F.col("cnt_b") - F.col("a_w"))
        )
    )
    var = 1.0 / (F.col("cnt_a") + F.col("a_w")) + 1.0 / (
        F.col("cnt_b") + F.col("a_w")
    )
    return w.select(
        "term",
        "cnt_a",
        "cnt_b",
        F.round(delta, 6).alias("delta"),
        F.round(delta / F.sqrt(var), 6).alias("z"),
    )


def benford_audit(
    df: DataFrame,
    value_col: str,
) -> DataFrame:
    """Benford's-law first-digit audit (Newcomb 1881; Nigrini's fraud
    test): naturally-grown magnitudes (prices, populations, citation
    counts) put digit d first with probability log10(1 + 1/d);
    fabricated, templated, or synthetically generated numbers don't.
    On a crawl corpus this is a cheap table-level forgery/boilerplate
    detector for extracted numeric facts (money amounts, case counts).

    One pass: positive values only, first digit via the integer string
    head (engine-portable — no pow/log10 float edge at decade
    boundaries), one 9-row count aggregate zero-filled against the
    digit spine, then chi-square and mean-absolute-deviation statistics
    attached to every row via a 1-row broadcast crossJoin (the
    tfidf.py constants pattern).

    Returns 9 rows: (digit, n_obs, obs_p, exp_p, chi2, mad) — chi2/mad
    repeated on each row; Nigrini's conformity bands: MAD < 0.006
    close, > 0.015 nonconformity.
    """
    v = F.col(value_col)
    fd = F.substring(F.floor(v).cast("long").cast("string"), 1, 1).cast(
        "int"
    )
    counts = (
        df.filter(v >= 1)
        .select(fd.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    filled = spine.join(counts, "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).alias("n_obs")
    )
    exp_p = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    tot = filled.agg(F.sum("n_obs").cast("double").alias("_tot"))
    scored = (
        filled.crossJoin(F.broadcast(tot))
        .withColumn("obs_p", F.col("n_obs") / F.col("_tot"))
        .withColumn("exp_p", exp_p)
        .withColumn(
            "_chi",
            F.pow(F.col("n_obs") - F.col("_tot") * F.col("exp_p"), 2)
            / (F.col("_tot") * F.col("exp_p")),
        )
        .withColumn("_ad", F.abs(F.col("obs_p") - F.col("exp_p")))
    )
    stats = scored.agg(
        F.round(F.sum("_chi"), 6).alias("chi2"),
        F.round(F.avg("_ad"), 6).alias("mad"),
    )
    return (
        scored.crossJoin(F.broadcast(stats))
        .select(
            "digit",
            "n_obs",
            F.round("obs_p", 6).alias("obs_p"),
            F.round("exp_p", 6).alias("exp_p"),
            "chi2",
            "mad",
        )
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Gini coefficient of a value distribution (host page counts,
    per-domain crawl budget, entity mention mass) — the single-number
    concentration audit behind every "is this crawl dominated by ten
    hosts?" question; complements the Zipf spectrum fit (q102: the
    exponent) with the inequality integral, and the skew diagnostics
    (q57/q88: who the heavy hitters ARE) with how much they own.

    Discrete formula over values x_1..x_n sorted ascending (ties break
    on the id for determinism): G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n
    — one global rank window plus one aggregate. The input is a
    per-KEY aggregate (hosts, domains), never the raw corpus, so the
    single-partition window sorts key-cardinality rows only; quantize
    upstream if the key universe itself is corpus-sized.

    Returns one row (n, total, gini): 0 = perfectly even, -> 1 =
    all mass on one key. NULL gini when total = 0.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(value_col).asc(), F.col(id_col).asc())
    ranked = df.select(
        F.col(value_col).cast("double").alias("x"),
        F.row_number().over(w).alias("i"),
    )
    return ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("x"), 6).alias("total"),
        F.round(
            F.try_divide(
                2.0 * F.sum(F.col("i") * F.col("x")),
                F.count(F.lit(1)) * F.sum("x"),
            )
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini"),
    )


def vocabulary_kl_drift(
    docs: DataFrame,
    is_new: Column,
    text_col: str = "text",
    alpha: int = 1,
) -> DataFrame:
    """Language drift between two crawl snapshots as smoothed unigram
    KL divergence — the distribution-level complement of the k-gram
    novelty curve (textops/novelty.py counts NEW grams; this measures
    how far the WHOLE vocabulary distribution moved, which catches
    topic shift even when no new words appear). Standard corpus-drift
    monitor for refresh scheduling and training-mixture rebalance.

    Both directions are reported (KL is asymmetric: new||old spikes on
    emerging vocabulary, old||new on vanishing vocabulary). Laplace
    smoothing with ``alpha`` over the UNION vocabulary keeps both
    distributions absolutely continuous, so every term is finite:

        p_side(w) = (c_side(w) + alpha) / (N_side + alpha * |V|)

    Relational shape: one tokenize-explode, one (word, side) count
    aggregate (map-side combinable), two 1-row total broadcasts, one
    sum — counts stay exact integers; the only floats are the final
    log-ratio sums (rounded). -> one row (vocab_size, n_old_tokens,
    n_new_tokens, kl_new_vs_old, kl_old_vs_new), NULL divergences when
    a side is empty."""
    toks = docs.select(
        is_new.cast("int").alias("g"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("w"),
    ).where(F.length("w") > 0)
    counts = toks.groupBy("w").agg(
        F.sum("g").alias("cn"),
        F.sum(1 - F.col("g")).alias("co"),
    )
    tot = counts.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("cn").alias("nn"),
        F.sum("co").alias("no"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    a = F.lit(alpha)
    pn = (F.col("cn") + a) / (F.col("nn") + a * F.col("v"))
    po = (F.col("co") + a) / (F.col("no") + a * F.col("v"))
    agg = j.agg(
        F.first("v").alias("vocab_size"),
        F.first("no").alias("n_old_tokens"),
        F.first("nn").alias("n_new_tokens"),
        F.sum(pn * F.log(pn / po)).alias("_kl_no"),
        F.sum(po * F.log(po / pn)).alias("_kl_on"),
    )
    ok = (F.col("n_old_tokens") > 0) & (F.col("n_new_tokens") > 0)
    return agg.select(
        "vocab_size",
        "n_old_tokens",
        "n_new_tokens",
        F.round(F.when(ok, F.col("_kl_no")), 6).alias("kl_new_vs_old"),
        F.round(F.when(ok, F.col("_kl_on")), 6).alias("kl_old_vs_new"),
    )
