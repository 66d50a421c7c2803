"""Deterministic fixtures shared by __spark_entry__, tests, and bench.

The driver's synthetic ``documents`` table is single-space-separated word soup
(verified: no double/leading/trailing whitespace at any SF), which makes the
full extraction pipeline SQL-oracle-checkable: token offsets are cumulative
sums, and gazetteer hits are expressible as CASE/substring arithmetic.
"""

from __future__ import annotations

from .ner.scorer import Gazetteer

# Multi-word gazetteer over the synthetic corpus vocabulary — exercises
# leftmost-longest matching and span scoring (labels reuse the LegalNER set).
PIPELINE_GAZETTEER = Gazetteer(
    {
        "hash join": "COURT",
        "table scan": "STATUTE",
        "sort merge": "PROVISION",
        "window agg": "PRECEDENT",
        "spark": "ORG",
        "customer": "OTHER_PERSON",
    },
    max_words=2,
)

# Single-word gazetteer — the token path with this dictionary is expressible
# as pure SQL (CASE + window functions), giving a full DuckDB oracle for the
# distributed adjacent-merge decode (q11).
TOKEN_GAZETTEER = Gazetteer(
    {
        "spark": "ORG",
        "customer": "OTHER_PERSON",
        "vector": "GPE",
        "window": "COURT",
    },
    max_words=1,
)

TOKEN_GAZETTEER_SQL_CASE = (
    "CASE token WHEN 'spark' THEN 'ORG' WHEN 'customer' THEN 'OTHER_PERSON' "
    "WHEN 'vector' THEN 'GPE' WHEN 'window' THEN 'COURT' ELSE 'O' END"
)
