"""Product quantization for embedding search (Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search" — the compression behind IVF-PQ
indexes in FAISS/Milvus): split each D-dim vector into S subvectors,
k-means each subspace independently, and store a vector as S small codes.
A query is answered with an Asymmetric Distance Computation (ADC) lookup
table: S x K exact subdistances from the query to every centroid, summed
per candidate through its codes — no full vector is ever touched at query
time.

Why this matters at 100 TB: a 64-dim float32 corpus is 256 B/vector; at
S=4, K=4 it is 4 codes = 1 B/vector (4 bits padded) plus a centroid table
of S*K*D/S doubles that always fits in a broadcast. Scan-side cost drops
by the same 256x, and the ADC join ships only (vid, sub, code) triples.

Everything is the repo's relational k-means (link/kmeans.py) applied per
subspace — deterministic seeds (k lowest-id vectors), distance ranking on
6-dp-rounded d2 with cid tie-break — so the SQL oracle unrolls the whole
train/encode/query pipeline exactly. The per-round shuffle is
|vectors| x S x K partial-aggregated rows; centroids and the ADC lookup
table are broadcast, so the corpus never reshuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pq_train_encode", "pq_adc_topk"]


def _sub_pos(emb: DataFrame, id_col: str, vec_col: str, sub_dim: int) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vid"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).select(
        "vid",
        F.floor(F.col("pos") / sub_dim).cast("int").alias("sub"),
        (F.col("pos") % sub_dim).alias("spos"),
        F.col("v").cast("double").alias("v"),
    )


def _assign(pos: DataFrame, cent: DataFrame) -> DataFrame:
    """(vid, sub, cid): nearest centroid per subspace; d2 rounded to 6 so
    ranking replays across engines, ties -> lowest cid."""
    d = (
        pos.join(F.broadcast(cent), ["sub", "spos"])
        .groupBy("vid", "sub", "cid")
        .agg(F.round(F.sum((F.col("v") - F.col("c")) ** 2), 6).alias("d2"))
    )
    w = Window.partitionBy("vid", "sub").orderBy(F.asc("d2"), F.asc("cid"))
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("vid", "sub", "cid")
    )


def pq_train_encode(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 4,
    iters: int = 1,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """-> (codebooks (sub, cid, spos, c), codes (vid, sub, cid)): per-
    subspace Lloyd training from deterministic seeds, then encoding of
    every vector under the final centroids."""
    pos = _sub_pos(emb, id_col, vec_col, sub_dim).localCheckpoint(eager=True)
    seed_w = Window.orderBy("vid")
    seeds = (
        pos.select("vid")
        .distinct()
        .orderBy("vid")
        .limit(k)
        .withColumn("cid", F.row_number().over(seed_w) - 1)
    )
    cent = pos.join(seeds, "vid").select("sub", "cid", "spos", F.col("v").alias("c"))
    for _ in range(iters):
        a = _assign(pos, cent)
        cent = (
            pos.join(a, ["vid", "sub"])
            .groupBy("sub", "cid", "spos")
            .agg(F.avg("v").alias("c"))
            .localCheckpoint(eager=True)
        )
    codes = _assign(pos, cent)
    return cent, codes


def pq_adc_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    codes: DataFrame,
    query_id: int,
    topk: int = 10,
    sub_dim: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (rank, vec_id, adc_d2, exact_d2): the PQ top-k for one query with
    the exact distance alongside for an approximation audit. The ADC
    lookup table (n_sub x k rows) and query subvectors are broadcast; the
    candidate side touches only its codes."""
    qpos = _sub_pos(
        emb.where(F.col(id_col) == query_id), id_col, vec_col, sub_dim
    ).select("sub", "spos", F.col("v").alias("qv"))
    lut = (
        codebooks.join(F.broadcast(qpos), ["sub", "spos"])
        .groupBy("sub", "cid")
        .agg(F.round(F.sum((F.col("c") - F.col("qv")) ** 2), 6).alias("_d"))
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub", "cid"])
        .groupBy("vid")
        .agg(F.round(F.sum("_d"), 6).alias("adc_d2"))
    )
    exact = (
        _sub_pos(emb, id_col, vec_col, sub_dim)
        .join(F.broadcast(qpos), ["sub", "spos"])
        .groupBy("vid")
        .agg(F.round(F.sum((F.col("v") - F.col("qv")) ** 2), 6).alias("exact_d2"))
    )
    w = Window.orderBy(F.asc("adc_d2"), F.asc("vid"))
    return (
        adc.join(exact, "vid")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("rank", F.col("vid").alias(id_col), "adc_d2", "exact_d2")
    )
