"""Judge-mention extraction and bench composition — the JUDGE lane of
the legal KG (JUDGE is a first-class LegalNER label in the reference's
label set, `/root/reference/legal_ner/` data config; schemas.py carries
it). Indian judgments introduce the bench with a rigid honorific chain:

    CORAM: HON'BLE MR. JUSTICE A.K. SIKRI, HON'BLE MRS. JUSTICE R. BANUMATHI

One codegen regex finds every ``[Hon'ble] [Mr./Mrs./Ms./Dr.] Justice
<Name>`` mention in document order; the honorific chain is part of the
match but NOT the captured name, so "HON'BLE MR. JUSTICE A.K. SIKRI"
and "Justice AK Sikri" normalize to the same ``judge_key`` (lowercased,
dots to spaces, whitespace collapsed — the same canonicalization rule as
graph/citations.case_mentions keys).

``bench_composition`` aggregates mentions per document into the sorted
distinct bench — benches are bounded (constitution benches top out at
13 judges), so the per-doc ``collect_set`` cannot blow a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["judge_mentions", "bench_composition", "JUDGE_RX"]

_CAP = r"(?:[A-Z](?:\.[A-Z])*\.|[A-Z]\w*)"
_NAME = rf"{_CAP}(?:\s+{_CAP})*"
_HON = r"(?:[Hh][Oo][Nn]'?[Bb][Ll][Ee]\s+)?(?:[Mm][Rr][Ss]?\.?\s+|[Mm][Ss]\.?\s+|[Dd][Rr]\.?\s+)?"
JUDGE_RX = rf"{_HON}(?:JUSTICE|Justice)\s+({_NAME})"


def judge_mentions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, judge, judge_key): one row per Justice mention in
    document order; ``judge`` is the surface name (honorifics stripped),
    ``judge_key`` the canonical node id."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(JUDGE_RX), F.lit(0))
    ).alias("idx", "_m")
    name = F.regexp_extract(F.col("_m"), JUDGE_RX, 1)
    key = F.trim(
        F.lower(F.regexp_replace(F.regexp_replace(name, r"\.", " "), r"\s+", " "))
    )
    return df.select(F.col(id_col), snip).select(
        id_col, "idx", name.alias("judge"), key.alias("judge_key")
    )


def bench_composition(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, judge_key, ...) -> (id_col, n_judges, bench): the sorted
    distinct bench per document. Benches are small by construction, so
    the set aggregate is bounded per row."""
    return mentions.groupBy(id_col).agg(
        F.size(F.collect_set("judge_key")).alias("n_judges"),
        F.sort_array(F.collect_set("judge_key")).alias("bench"),
    )
