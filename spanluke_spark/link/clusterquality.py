"""Internal cluster-quality indices on embedding clusters:
Calinski-Harabasz (Calinski & Harabasz 1974) and the squared Dunn
index (Dunn 1974) — is a labelling/clustering of the embedding space
actually TIGHT and SEPARATED? The variance-ratio and worst-case
companions of silhouette (q335, per-point) and k-means inertia
(q55): CH is what sklearn reports for model selection, Dunn is the
adversarial bound (ONE straggling pair ruins it).

Exactness: float embeddings are quantized ONCE per coordinate to
integer milli-units (round(x * 1000) — both engines round the same
parquet float, so the integers agree bit-for-bit; the q334
once-quantized input discipline), and everything after is integer.

CH with per-cluster/dimension sums S_cd, Q_cd, sizes n_c, global
S_d, n, k clusters:

  w_cell_c  = 1000 * sum_d (n_c*Q_cd - S_cd^2) div n_c
  b_cell_c  = 1000 * sum_d (n*S_cd - n_c*S_d)^2 div (n_c * n^2)
  ch_milli  = 1000 * sum(b_cell) * (n - k)
              div (sum(w_cell) * (k - 1))        [DECIMAL/HUGEINT]

(the within/between cells are once-quantized per cluster — stated —
so both engines sum identical integers). Degenerate lanes: k < 2 or
zero within-dispersion (every cluster collapsed to its centroid)
surface NULL ch.

Dunn, squared (sqrt-free): over the bounded point-pair join,

  dunn2_milli = 1000 * min inter-cluster d^2 div max intra d^2

NULL when any cluster is a singleton-free... when no intra pair
exists (all clusters singletons) or the max intra distance is 0
(duplicate-only clusters). Pair-join contract: Dunn is O(n^2) by
definition — bounded evaluation slices (the q266 class contract;
CH has no such limit and is the at-scale index).

Distributed shape: CH is one posexplode + two groupBy aggregates —
linear, scales to full corpora. Dunn is the documented bounded pair
join with per-pair distances folded JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["calinski_harabasz", "dunn_index", "quantized_coords"]


def quantized_coords(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """-> (id, label, d 1-based, v): once-quantized integer milli
    coordinates of the first ``dims`` dimensions."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lab"),
        F.posexplode(F.slice(F.col(vec_col), 1, dims)).alias(
            "d0", "x"
        ),
    ).select(
        "id",
        "lab",
        (F.col("d0") + 1).alias("d"),
        F.round(F.col("x") * 1000).cast("long").alias("v"),
    )


def calinski_harabasz(
    df: DataFrame,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """-> ONE row (n, k, w_milli, b_milli, ch_milli)."""
    q = quantized_coords(df, dims, id_col, vec_col, label_col)
    per_cd = q.groupBy("lab", "d").agg(
        F.count(F.lit(1)).cast("long").alias("nc"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("qq"),
    )
    glob = per_cd.groupBy("d").agg(
        F.sum("nc").alias("n"), F.sum("s").alias("sg")
    )
    cells = (
        per_cd.join(glob, "d")
        .groupBy("lab")
        .agg(
            F.max("nc").alias("nc"),
            F.max("n").alias("n"),
            F.sum(
                F.col("nc") * F.col("qq") - F.col("s") * F.col("s")
            ).alias("w_num"),
            F.sum(
                F.expr(
                    "cast(n * s - nc * sg as decimal(38,0))"
                    " * (n * s - nc * sg)"
                )
            ).alias("b_num"),
        )
        .select(
            "n",
            F.expr("1000 * w_num div nc").alias("w_cell"),
            F.expr(
                "cast(b_num * 1000"
                " div (cast(nc as decimal(38,0)) * n * n) as long)"
            ).alias("b_cell"),
        )
    )
    agg = cells.groupBy().agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w_cell").alias("w_milli"),
        F.sum("b_cell").alias("b_milli"),
    )
    return agg.select(
        "n",
        "k",
        "w_milli",
        "b_milli",
        F.when(
            (F.col("k") >= 2) & (F.col("w_milli") > 0),
            F.expr(
                "cast(1000 * cast(b_milli as decimal(38,0)) * (n - k)"
                " div (cast(w_milli as decimal(38,0)) * (k - 1))"
                " as long)"
            ),
        ).alias("ch_milli"),
    )


def dunn_index(
    df: DataFrame,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """-> ONE row (n, k, min_inter_d2, max_intra_d2, dunn2_milli)."""
    q = quantized_coords(df, dims, id_col, vec_col, label_col)
    a = q.select(
        F.col("id").alias("i"),
        F.col("lab").alias("la"),
        "d",
        F.col("v").alias("va"),
    )
    b = q.select(
        F.col("id").alias("j"),
        F.col("lab").alias("lb"),
        F.col("d").alias("d2"),
        F.col("v").alias("vb"),
    )
    pairs = (
        a.join(b, (F.col("d") == F.col("d2")) & (F.col("i") < F.col("j")))
        .groupBy("i", "j", "la", "lb")
        .agg(
            F.sum(
                (F.col("va") - F.col("vb"))
                * (F.col("va") - F.col("vb"))
            ).alias("dist2")
        )
    )
    stats = pairs.groupBy().agg(
        F.min(
            F.when(F.col("la") != F.col("lb"), F.col("dist2"))
        ).alias("min_inter_d2"),
        F.max(
            F.when(F.col("la") == F.col("lb"), F.col("dist2"))
        ).alias("max_intra_d2"),
    )
    counts = q.groupBy().agg(
        F.countDistinct("id").cast("long").alias("n"),
        F.countDistinct("lab").cast("long").alias("k"),
    )
    out = counts.crossJoin(F.broadcast(stats))
    return out.select(
        "n",
        "k",
        "min_inter_d2",
        "max_intra_d2",
        F.when(
            F.col("max_intra_d2") > 0,
            F.expr("1000 * min_inter_d2 div max_intra_d2"),
        ).alias("dunn2_milli"),
    )
