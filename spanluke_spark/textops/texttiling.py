"""TextTiling topic segmentation (Hearst, CL 1997) — lexical-cohesion
valleys mark topic boundaries: slide two adjacent word-count blocks
across the token stream, score each gap by block similarity, and cut
where the similarity dips deepest below its neighboring peaks. The
segmentation front end for chunking (q52) and passage retrieval — a
100 TB corpus is segmented doc-by-doc, embarrassingly parallel.

Deviations from Hearst 1997, chosen for exact cross-engine replay and
documented here: (1) block similarity is the SQUARED cosine as the
exact rational dot^2 * 10^6 div (|L|^2 |R|^2) — a monotone transform
of cosine for non-negative counts, so valley ORDER is preserved;
(2) the boundary cutoff is the doc's mean depth (Hearst: mean - s/2;
the s/2 term needs a sqrt, which would break integer replay) — the
strictly-greater-than-mean rule is evaluated as n * depth > sum_depth.

The peak climb is NOT a sequential per-doc loop: the left peak of gap
i is the max similarity over the maximal non-INCREASING run that ends
at i, so runs are labeled by a cumulative sum of "sim rose here"
flags and the peak is a max over (doc, run) — two lag/lead windows +
two run maxes, identical in SQL. depth_i = lp_i + rp_i - 2 sim_i.

Distributed shape: one token explode -> per-(doc, block, word) counts
-> each block contributes to <= 4 gaps (constant fan-out explode) ->
one join per gap side on (doc, gap, word) for the dot, one agg for
norms, windows keyed by doc. Everything is corpus-linear; per-doc gap
counts are bounded by doc length / block size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["texttiling"]


def texttiling(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    block: int = 10,
) -> DataFrame:
    """(id, text) -> per valid gap g (2 <= g <= n_blocks - 2, i.e.
    two full blocks on each side): (id, g, dot, nl, nr, sim2_ppm,
    depth_ppm, boundary). Docs shorter than 4 blocks emit nothing."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("pos", "w"),
    ).select("id", (F.col("pos") / block).cast("int").alias("b"), "w")
    nb = toks.groupBy("id").agg((F.max("b") + 1).alias("n_blocks"))
    cnt = toks.groupBy("id", "b", "w").agg(F.count(F.lit(1)).alias("c"))
    # block b feeds the LEFT window of gaps b+1, b+2 and the RIGHT
    # window of gaps b-1, b
    sides = cnt.select(
        "id",
        "w",
        "c",
        F.explode(
            F.array(
                F.struct((F.col("b") + 1).alias("g"), F.lit("l").alias("side")),
                F.struct((F.col("b") + 2).alias("g"), F.lit("l").alias("side")),
                F.struct((F.col("b") - 1).alias("g"), F.lit("r").alias("side")),
                F.struct(F.col("b").alias("g"), F.lit("r").alias("side")),
            )
        ).alias("s"),
    ).select("id", "w", "c", "s.g", "s.side")
    sides = sides.join(nb, "id").where(
        (F.col("g") >= 2) & (F.col("g") <= F.col("n_blocks") - 2)
    )
    agg = sides.groupBy("id", "g", "w", "side").agg(F.sum("c").alias("c"))
    left = agg.where(F.col("side") == "l").select(
        "id", "g", "w", F.col("c").alias("cl")
    )
    right = agg.where(F.col("side") == "r").select(
        "id", "g", "w", F.col("c").alias("cr")
    )
    dot = (
        left.join(right, ["id", "g", "w"])
        .groupBy("id", "g")
        .agg(F.sum(F.col("cl") * F.col("cr")).cast("long").alias("dot"))
    )
    nl = left.groupBy("id", "g").agg(
        F.sum(F.col("cl") * F.col("cl")).cast("long").alias("nl")
    )
    nr = right.groupBy("id", "g").agg(
        F.sum(F.col("cr") * F.col("cr")).cast("long").alias("nr")
    )
    sims = (
        nl.join(nr, ["id", "g"])
        .join(dot, ["id", "g"], "left")
        .select(
            "id",
            "g",
            F.coalesce("dot", F.lit(0)).alias("dot"),
            "nl",
            "nr",
        )
        .withColumn(
            "sim2_ppm",
            F.expr("dot * dot * 1000000 div (nl * nr)"),
        )
    )
    wo = Window.partitionBy("id").orderBy("g")
    wr = Window.partitionBy("id").orderBy(F.col("g").desc())
    sims = (
        sims.withColumn(
            "linc",
            F.when(
                F.lag("sim2_ppm").over(wo).isNull()
                | (F.col("sim2_ppm") > F.lag("sim2_ppm").over(wo)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "rinc",
            F.when(
                F.lag("sim2_ppm").over(wr).isNull()
                | (F.col("sim2_ppm") > F.lag("sim2_ppm").over(wr)),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "lrun",
            F.sum("linc").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "rrun",
            F.sum("rinc").over(wr.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    sims = sims.withColumn(
        "lp", F.max("sim2_ppm").over(Window.partitionBy("id", "lrun"))
    ).withColumn(
        "rp", F.max("sim2_ppm").over(Window.partitionBy("id", "rrun"))
    )
    sims = sims.withColumn(
        "depth_ppm",
        (F.col("lp") + F.col("rp") - 2 * F.col("sim2_ppm")).cast("long"),
    )
    stats = sims.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("depth_ppm").alias("sum_depth"),
    )
    return (
        sims.join(stats, "id")
        .withColumn(
            "boundary",
            (F.col("depth_ppm") > 0)
            & (
                F.col("n_gaps") * F.col("depth_ppm") > F.col("sum_depth")
            ),
        )
        .select(
            "id", "g", "dot", "nl", "nr", "sim2_ppm", "depth_ppm", "boundary"
        )
    )
