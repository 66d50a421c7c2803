"""Inter-annotator agreement — Cohen's kappa between two labelings of
the same items (two NER models, two distant-supervision runs, human vs
model): chance-corrected agreement, the number that decides whether a
silver-label source is good enough to train on.

kappa = (p_o - p_e) / (1 - p_e) with p_o the observed agreement rate
over co-labeled items and p_e the chance rate implied by each side's
label marginals. Three hash aggregates and one equi-join on the item
key; the marginal product is a broadcast of two label-cardinality-sized
tables — nothing scales with corpus size except the one co-label join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohen_kappa(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
) -> DataFrame:
    """a(keys..., label) x b(keys..., label) -> one row
    (n_items, p_o, p_e, kappa). Items present in only one side are
    excluded (kappa is defined over co-labeled items). kappa is NULL
    when p_e = 1 (both sides constant — agreement is uninformative)."""
    la = a.select(*key_cols, F.col(label_col).alias("_la"))
    lb = b.select(*key_cols, F.col(label_col).alias("_lb"))
    both = la.join(lb, key_cols)

    obs = both.agg(
        F.count(F.lit(1)).alias("n_items"),
        F.avg(
            (F.col("_la") == F.col("_lb")).cast("double")
        ).alias("p_o"),
    )
    ma = both.groupBy(F.col("_la").alias("lbl")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    mb = both.groupBy(F.col("_lb").alias("lbl")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    pe = (
        ma.join(mb, "lbl")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("_num"))
    )
    out = obs.crossJoin(F.broadcast(pe)).select(
        "n_items",
        "p_o",
        (
            F.coalesce("_num", F.lit(0))
            / (F.col("n_items") * F.col("n_items"))
        ).alias("p_e"),
    )
    return out.select(
        "n_items",
        "p_o",
        "p_e",
        F.try_divide(
            F.col("p_o") - F.col("p_e"), F.lit(1.0) - F.col("p_e")
        ).alias("kappa"),
    )


def krippendorff_alpha(
    df: DataFrame,
    item_col: str = "item",
    coder_col: str = "coder",
    label_col: str = "label",
) -> DataFrame:
    """Krippendorff's alpha for NOMINAL data (Krippendorff 2004) — the
    agreement coefficient Cohen's kappa can't be: any number of coders,
    missing annotations allowed (items with a single annotation are
    excluded as unpairable rather than breaking the design).

    Via the coincidence matrix: within each item with m >= 2
    annotations, every ORDERED pair of annotations from distinct coders
    contributes 1/(m-1) to cell (label_a, label_b);
    Do = off-diagonal mass / n, De = sum_{c<>c'} n_c n_{c'} / (n(n-1)),
    alpha = 1 - Do/De (NULL when De = 0 — all coincidences one label).

    Shape: one duplicate-collapse aggregate, one per-item count, one
    within-item self-join (quadratic in CODERS PER ITEM, a small
    constant — the annotator panel, not the corpus), two label-keyed
    aggregates. One output row.
    """
    ann = df.select(
        F.col(item_col).alias("i"),
        F.col(coder_col).alias("coder"),
        F.col(label_col).alias("lbl"),
    ).distinct()
    m = ann.groupBy("i").agg(F.count(F.lit(1)).alias("m")).filter(
        F.col("m") >= 2
    )
    a = ann.join(m, "i")
    b = ann.select(
        F.col("i"),
        F.col("coder").alias("coder_b"),
        F.col("lbl").alias("lbl_b"),
    )
    pairs = a.join(b, "i").filter(F.col("coder") != F.col("coder_b"))
    o = pairs.groupBy(F.col("lbl").alias("la"), F.col("lbl_b").alias("lb")).agg(
        F.sum(1.0 / (F.col("m") - 1)).alias("w")
    )
    nc = o.groupBy("la").agg(F.sum("w").alias("n_c"))
    tot = nc.agg(F.sum("n_c").alias("n"))
    d_o = o.filter(F.col("la") != F.col("lb")).agg(
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("_onum")
    )
    d_e = (
        nc.crossJoin(
            F.broadcast(nc.select(F.col("la").alias("lb"), F.col("n_c").alias("n_c2")))
        )
        .filter(F.col("la") != F.col("lb"))
        .agg(F.coalesce(F.sum(F.col("n_c") * F.col("n_c2")), F.lit(0.0)).alias("_enum"))
    )
    return (
        tot.crossJoin(F.broadcast(d_o))
        .crossJoin(F.broadcast(d_e))
        .select(
            F.round("n", 6).alias("n_coincidences"),
            F.round(F.try_divide(F.col("_onum"), F.col("n")), 6).alias(
                "do_rate"
            ),
            F.round(
                F.try_divide(
                    F.col("_enum"), F.col("n") * (F.col("n") - 1)
                ),
                6,
            ).alias("de_rate"),
            F.round(
                F.lit(1.0)
                - F.try_divide(
                    F.try_divide(F.col("_onum"), F.col("n")),
                    F.try_divide(
                        F.col("_enum"), F.col("n") * (F.col("n") - 1)
                    ),
                ),
                6,
            ).alias("alpha"),
        )
    )


def weighted_kappa(
    a: DataFrame,
    b: DataFrame,
    key_cols: list[str],
    label_col: str = "label",
    quadratic: bool = True,
) -> DataFrame:
    """Weighted Cohen's kappa for ORDINAL labels (Cohen 1968) — the
    agreement score when categories are ordered quality buckets and a
    4-vs-3 disagreement must cost less than a 4-vs-0: quadratic
    weights w_ij = (i - j)^2 (the reported-everywhere QWK) or linear
    |i - j|. ``a``/``b`` carry integer-ordinal labels.

    Exactness discipline: with observed cells O_ij and marginals
    a_i, b_j over n co-labeled items,

      kappa_w = 1 - n*sum w_ij*O_ij / sum w_ij*a_i*b_j

    is one exact rational: kappa_ppm = sign-split
    (den - num) * 10^6 div den with num = n*sum(w*O) (both exact
    integer sums). den = 0 (no weighted chance disagreement — both
    sides constant on the same label) surfaces NULL. Perfect
    agreement gives num = 0 -> exactly 10^6; exact-independence
    grids (O_ij = a_i*b_j/n) give num == den -> exactly 0. Unlike
    the unweighted ``cohen_kappa`` above (float p_o/p_e), this lane
    is integer end-to-end.

    Shape: one co-label equi-join, one (la, lb) cell aggregate, two
    label-cardinality marginals cross-joined broadcast-side."""
    la = a.select(*key_cols, F.col(label_col).cast("long").alias("_la"))
    lb = b.select(*key_cols, F.col(label_col).cast("long").alias("_lb"))
    both = la.join(lb, key_cols)

    def w(i, j):
        d = F.abs(i - j)
        return (d * d) if quadratic else d

    cells = both.groupBy("_la", "_lb").agg(
        F.count(F.lit(1)).cast("long").alias("oij")
    )
    ma = cells.groupBy(F.col("_la").alias("i")).agg(
        F.sum("oij").alias("ai")
    )
    mb = cells.groupBy(F.col("_lb").alias("j")).agg(
        F.sum("oij").alias("bj")
    )
    tot = cells.groupBy().agg(F.sum("oij").alias("n_items"))
    num = cells.crossJoin(F.broadcast(tot)).groupBy().agg(
        F.max("n_items").alias("n_items"),
        F.sum(
            F.col("n_items") * w(F.col("_la"), F.col("_lb")) * F.col("oij")
        ).alias("num"),
    )
    den = ma.crossJoin(mb).groupBy().agg(
        F.sum(w(F.col("i"), F.col("j")) * F.col("ai") * F.col("bj")).alias(
            "den"
        )
    )
    x = num.crossJoin(F.broadcast(den))
    diff = F.col("den") - F.col("num")
    mag = F.expr("abs(den - num) * 1000000 div den")
    return x.select(
        "n_items",
        "num",
        "den",
        F.when(
            F.col("den") > 0,
            F.when(diff < 0, -mag).otherwise(mag),
        ).alias("kappa_ppm"),
    )
