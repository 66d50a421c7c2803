"""Bigram conditional entropy H(W|C), marginal entropy H(W) and their
difference — the mutual information rate of adjacent tokens — per
corpus group (Shannon 1951's printed-English estimate, computed the
modern count-based way). The information-theoretic audit beside the
KL vocabulary drift (q275) and Good-Turing missing mass (q158): a
slice whose H(W|C) collapses is template/boilerplate text (next token
nearly determined), one whose H(W|C) approaches H(W) is word salad
(context tells nothing) — both are crawl-quality smells invisible to
length/stopword heuristics.

Exact carry: with bigram counts n_cw, context totals n_c, marginals
n_w and N = total bigrams,

  H(W|C) = -sum n_cw/N * ln(n_cw/n_c)
  H(W)   = -sum n_w /N * ln(n_w /N)

each ln ratio is quantized ONCE to round(ln * 10^6) per (c, w) (or
w), the weighted sums are integer, and the final division is
trunc-ppm: h_ppm = (-S) div N. mi_ppm = h_w_ppm - h_wc_ppm (>= 0 up
to quantization). No smoothing — these are the plug-in estimates of
the observed corpus, not a language model (that's q76/q211).

Distributed shape: one native-HOF bigram explode, three combinable
groupBys (bigram, context, marginal), broadcast-sized joins of the
count relations, one final agg per group. Corpus-linear, no windows,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bigram_entropy"]


def bigram_entropy(
    docs: DataFrame,
    group_col: str = "grp",
    text_col: str = "text",
) -> DataFrame:
    """(group, text) -> per group: (grp, n_bigrams, n_contexts,
    n_words, h_w_ppm, h_wc_ppm, mi_ppm). Groups whose docs are all
    shorter than 2 tokens emit nothing."""
    arr = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    bg = docs.select(
        F.col(group_col).alias("grp"), arr.alias("a")
    ).select(
        "grp",
        F.explode(
            F.when(
                F.size("a") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("a") - 1),
                    lambda i: F.struct(
                        F.element_at("a", i).alias("c"),
                        F.element_at("a", i + 1).alias("w"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<c:string,w:string>>")
            )
        ).alias("p"),
    ).select("grp", "p.c", "p.w")
    ncw = bg.groupBy("grp", "c", "w").agg(F.count(F.lit(1)).alias("ncw"))
    nc = ncw.groupBy("grp", "c").agg(F.sum("ncw").alias("nc"))
    nw = ncw.groupBy("grp", "w").agg(F.sum("ncw").alias("nw"))
    tot = ncw.groupBy("grp").agg(F.sum("ncw").cast("long").alias("n"))

    def lnppm(a, b):
        return F.round(F.log(a / b) * 1_000_000).cast("long")

    s_wc = (
        ncw.join(nc, ["grp", "c"])
        .select(
            "grp",
            (F.col("ncw") * lnppm(F.col("ncw"), F.col("nc"))).alias("t"),
        )
        .groupBy("grp")
        .agg(F.sum("t").alias("s_wc"))
    )
    s_w = (
        nw.join(tot, "grp")
        .select(
            "grp",
            (F.col("nw") * lnppm(F.col("nw"), F.col("n"))).alias("t"),
        )
        .groupBy("grp")
        .agg(F.sum("t").alias("s_w"))
    )
    counts = (
        tot.join(
            nc.groupBy("grp").agg(F.count(F.lit(1)).alias("n_contexts")),
            "grp",
        )
        .join(
            nw.groupBy("grp").agg(F.count(F.lit(1)).alias("n_words")),
            "grp",
        )
    )
    out = counts.join(s_wc, "grp").join(s_w, "grp")
    return out.select(
        "grp",
        F.col("n").alias("n_bigrams"),
        "n_contexts",
        "n_words",
        F.expr("(-s_w) div n").alias("h_w_ppm"),
        F.expr("(-s_wc) div n").alias("h_wc_ppm"),
        (
            F.expr("(-s_w) div n") - F.expr("(-s_wc) div n")
        ).alias("mi_ppm"),
    )
