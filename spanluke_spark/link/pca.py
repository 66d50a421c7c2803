"""Distributed PCA (top principal component) over an embedding column —
the spectral direction used for embedding whitening, SemDeDup-style
cluster conditioning, and detecting batch effects / encoder drift in a
100 TB embedding store.

Shape (the MLlib computePrincipalComponents shape, re-derived): the ONLY
data-sized work is one pass building the d x d Gram matrix — each row
contributes its d^2 outer-product cells through a flat projection (no
join, no window), and the (i, j)-cell aggregate is map-side combinable,
so the shuffle carries at most d^2 rows per task no matter how many
vectors flow through. The d^2 relation (d <= a few hundred) is then the
ONLY thing collected — the bounded-collect discipline of link/kmeans
(k centroid rows) and etl/bpe (top-K batch) — and the power iteration
runs on that tiny matrix driver-side.

Exact-replay discipline: embeddings are quantized to integers
(round(x * scale)) BEFORE the Gram pass, so Gram cells and column sums
are EXACT BIGINTs in any summation order — the covariance/scatter cells
g_ij - s_i * s_j / n are then single float expressions over exact
integers, bit-identical in the DuckDB oracle; the subsequent fixed-round
power iteration operates on identical matrices in both engines, so
round-6 outputs agree. Sign is pinned by the max-|loading| component
(ties to the lowest index) forced positive.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gram_cells_agg", "quantized_scatter", "pca_power", "py_power_iteration"]


def gram_cells_agg(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int = 16,
    scale: int = 64,
) -> DataFrame:
    """The distributed half of the PCA pass, exposed for plan audits:
    -> (i, j, s) exact-integer Gram cells (j = -1 rows carry the per-dim
    sums). One flat projection + one partial+final hash aggregate."""
    q = F.transform(
        F.slice(F.col(vec_col), 1, d),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    rows = df.select(q.alias("q")).where(F.size("q") == d)
    # every (i, j, qi*qj) cell plus a (i, -1, qi) sum cell per row, one
    # flat projection -> one partial+final agg (<= d^2 + d groups)
    cells = rows.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("q"),
                    lambda x, i: F.concat(
                        F.transform(
                            F.col("q"),
                            lambda y, j: F.struct(
                                i.alias("i"), j.alias("j"), (x * y).alias("v")
                            ),
                        ),
                        F.array(
                            F.struct(
                                i.alias("i"),
                                F.lit(-1).alias("j"),
                                x.alias("v"),
                            )
                        ),
                    ),
                )
            )
        ).alias("c")
    ).select("c.i", "c.j", "c.v")
    return cells.groupBy("i", "j").agg(F.sum("v").alias("s"))


def quantized_scatter(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int = 16,
    scale: int = 64,
) -> tuple[list[list[float]], int]:
    """One distributed pass -> (scatter matrix S = G - s s^T / n as a
    d x d list-of-lists, n). Gram cells and per-dim sums are exact
    integers; only the d^2 + d rows come back to the driver."""
    agg = gram_cells_agg(df, vec_col, d, scale).collect()
    rows = df.select(F.slice(F.col(vec_col), 1, d).alias("q")).where(
        F.size("q") == d
    )
    n = rows.count()
    if n == 0:
        raise ValueError("pca: no complete vectors")
    gram = [[0] * d for _ in range(d)]
    sums = [0] * d
    for r in agg:
        if r["j"] == -1:
            sums[r["i"]] = r["s"]
        else:
            gram[r["i"]][r["j"]] = r["s"]
    scatter = [
        [gram[i][j] - sums[i] * sums[j] / n for j in range(d)] for i in range(d)
    ]
    return scatter, n


def py_power_iteration(
    scatter: list[list[float]], rounds: int = 8
) -> tuple[list[float], float, float]:
    """Fixed-round power iteration from the all-ones direction ->
    (loadings, eigval = v^T S v, ev_share = eigval / trace(S)). Pure
    driver-side floats on the d x d matrix; sign pinned by forcing the
    max-|loading| component (ties to lowest index) positive."""
    d = len(scatter)
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(rounds):
        u = [sum(scatter[i][j] * v[j] for j in range(d)) for i in range(d)]
        nrm = math.sqrt(sum(x * x for x in u))
        if nrm == 0.0:
            raise ValueError("pca: zero matrix")
        v = [x / nrm for x in u]
    eig = sum(v[i] * sum(scatter[i][j] * v[j] for j in range(d)) for i in range(d))
    pin = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[pin] < 0:
        v = [-x for x in v]
    trace = sum(scatter[i][i] for i in range(d))
    return v, eig, (eig / trace if trace else float("nan"))


def pca_power(
    df: DataFrame,
    vec_col: str = "embedding",
    d: int = 16,
    scale: int = 64,
    rounds: int = 8,
) -> DataFrame:
    """-> (dim, loading, ev_share): PC1 loadings of the quantized
    embedding scatter matrix after ``rounds`` power iterations, plus the
    explained-variance share (same value on every row)."""
    scatter, _ = quantized_scatter(df, vec_col, d, scale)
    v, _eig, share = py_power_iteration(scatter, rounds)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, round(v[i], 6), round(share, 6)) for i in range(d)],
        "dim int, loading double, ev_share double",
    )
