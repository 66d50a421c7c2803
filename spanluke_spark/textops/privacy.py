"""Privacy risk auditing for training-data release — k-anonymity
(Sweeney 2002) and l-diversity (Machanavelli et al. 2007) over
quasi-identifier combinations, plus suppression, the baseline
anonymization every data release pipeline runs AFTER the regex-level
PII redaction in textops/pii.py (redaction removes direct identifiers;
quasi-identifier COMBINATIONS re-identify anyway — that is what k
measures).

Shape: one hash aggregate over the quasi-identifier key (map-side
partial; the exact distinct-sensitive count is Spark's standard
two-level expand aggregate), one left_semi join back for suppression.
Nothing scales beyond the distinct quasi-combination count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["k_anonymity_report", "suppress_small_classes"]


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
    l_div: int = 2,
) -> DataFrame:
    """One row per quasi-identifier equivalence class: (quasi...,
    class_size, n_sensitive, k_anonymous, l_diverse, reid_risk).
    reid_risk = 1/class_size, the journalist re-identification bound."""
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).alias("n_sensitive"),
        )
        .select(
            *quasi_cols,
            "class_size",
            "n_sensitive",
            (F.col("class_size") >= k).alias("k_anonymous"),
            (F.col("n_sensitive") >= l_div).alias("l_diverse"),
            F.round(1.0 / F.col("class_size"), 6).alias("reid_risk"),
        )
    )


def suppress_small_classes(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymization by record suppression: drop every row whose
    quasi-identifier class has fewer than k members. Idempotent (classes
    only shrink to zero or stay intact), schema-preserving."""
    big = (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= k)
        .select(*quasi_cols)
    )
    return df.join(big, quasi_cols, "left_semi")
