"""Training-data mixture weighting: temperature-scaled source sampling.

The standard multi-source LLM recipe (mT5/XLM-R style): source s with
share p_s of the corpus is sampled with probability ∝ p_s^alpha
(alpha < 1 flattens the head so low-resource sources are not drowned),
then per-document inclusion is decided DETERMINISTICALLY by hash — the
same no-rand() contract as textops/sampling.py, so a re-run (or a resume
after a crash) selects the identical subset on any cluster size.

``mixture_weights`` is a one-pass aggregate (+ 1-row broadcast for the
normalizer). ``mixture_sample`` broadcasts the per-source rate table
(sources number in the dozens, never more) and filters JVM-side: the
portable md5 unit hash of (salt, doc_id) compared against the source's
admission rate — zero shuffles over the corpus.

Rates are computed against a target budget expressed as a fraction of
TOTAL corpus tokens; a source whose temperature share exceeds its actual
token mass is capped at rate 1.0 (you cannot sample what is not there —
the mass the cap leaves unused is reported, not silently re-spread, so
budget accounting stays auditable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mixture_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    budget_frac: float = 0.3,
    source_col: str = "source",
    size_col: str = "n_chars",
) -> DataFrame:
    """-> (source, n_tokens, share, temp_share, rate): per-source token
    mass, raw share, temperature share p^alpha / Σ p^alpha, and the
    admission rate min(1, budget_frac · total · temp_share / n_tokens)."""
    per = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(size_col).alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_total"),
    )
    shared = per.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.col("n_tokens") / F.col("_total")
    )
    norm = shared.agg(F.sum(F.pow("share", F.lit(alpha))).alias("_z"))
    return (
        shared.crossJoin(F.broadcast(norm))
        .withColumn("temp_share", F.pow("share", F.lit(alpha)) / F.col("_z"))
        .withColumn(
            "rate",
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("_total")
                * F.col("temp_share")
                / F.col("n_tokens"),
            ),
        )
        .select("source", "n_tokens", "share", "temp_share", "rate")
    )


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "mix0",
) -> DataFrame:
    """Deterministic hash-gated sample of ``docs`` at each source's
    admission rate. Same (id, salt) -> same decision on any cluster;
    uses the portable md5 unit hash (sampling.py) so lineage replays and
    the DuckDB oracle reproduce the subset bit-for-bit."""
    from .sampling import _unit_hash

    u = _unit_hash(F.col(id_col), salt)
    rates = weights.select(F.col("source").alias(source_col), "rate")
    return (
        docs.join(F.broadcast(rates), source_col)
        .where(u < F.col("rate"))
        .drop("rate")
    )
