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
