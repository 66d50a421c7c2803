"""Allen's interval algebra (Allen, CACM 1983) over fact validity
intervals — the temporal-KG primitive the SCD2 store (storage/scd.py)
and fact-validity lane (q91) stop short of: CLASSIFY how two facts about
the same subject relate in time. "Judge X presided [2001,2009), case Y
ran [2003,2005)" -> Y happened DURING X's tenure; conflicting role facts
that OVERLAP are contradiction candidates; a succession is a MEETS.

The 13 relations partition every pair of valid intervals (start < end,
same point scale on both sides): before/after, meets/met_by,
overlaps/overlapped_by, starts/started_by, during/contains,
finishes/finished_by, equals. One CASE chain over an equi-join on the
subject key with id_a < id_b — each unordered pair classified once, the
inverse name encoding direction.

Scale shape: the self-join is per-SUBJECT quadratic, corpus-linear —
exactly the fuzzy-pair shape canon/canonicalize.py uses; real KGs hold
a handful of temporal facts per subject. Rows with start >= end are
dropped (the relations are undefined on empty/negative intervals); the
join and the aggregate both key on the subject, so one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["allen_relations", "ALLEN_RELATIONS"]

ALLEN_RELATIONS = [
    "before", "meets", "overlaps", "starts", "during", "finishes",
    "equals",
    "after", "met_by", "overlapped_by", "started_by", "contains",
    "finished_by",
]


def allen_relations(
    df: DataFrame,
    key_col: str = "subj",
    id_col: str = "fact_id",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """(key, id_a, id_b, relation): the Allen relation of interval a
    RELATIVE TO interval b for every within-subject pair id_a < id_b.
    Intervals are [start, end) with start < end enforced by filter."""
    valid = df.filter(F.col(start_col) < F.col(end_col)).select(
        F.col(key_col).alias("key"),
        F.col(id_col).alias("id"),
        F.col(start_col).alias("s"),
        F.col(end_col).alias("e"),
    )
    a = valid.select(
        "key",
        F.col("id").alias("id_a"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = valid.select(
        "key",
        F.col("id").alias("id_b"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    sa, ea, sb, eb = (F.col(c) for c in ("sa", "ea", "sb", "eb"))
    rel = (
        F.when((sa == sb) & (ea == eb), "equals")
        .when(ea < sb, "before")
        .when(eb < sa, "after")
        .when(ea == sb, "meets")
        .when(eb == sa, "met_by")
        .when((sa == sb) & (ea < eb), "starts")
        .when((sa == sb) & (ea > eb), "started_by")
        .when((ea == eb) & (sa > sb), "finishes")
        .when((ea == eb) & (sa < sb), "finished_by")
        .when((sa > sb) & (ea < eb), "during")
        .when((sa < sb) & (ea > eb), "contains")
        .when((sa < sb) & (sb < ea) & (ea < eb), "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        a.join(b, "key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("key", "id_a", "id_b", rel.alias("relation"))
    )
