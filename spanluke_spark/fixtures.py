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

# Frozen WordPiece vocabulary: build_wordpiece_vocab(documents@sf0.01,
# top_k=60) — the moral equivalent of shipping a trained tokenizer. Greedy
# longest-match over these units is deterministic and exactly replayable in
# SQL (q35's recursive-CTE oracle uses the same list).
WORDPIECE_VOCAB = [
    'ab', 'abl', 'able', 'ag', 'agg', 'al', 'all', 'alu', 'alue', 'an', 'ar',
    'ark', 'as', 'ash', 'at', 'ata', 'atc', 'atch', 'ba', 'bat', 'batc', 'bl',
    'ble', 'ca', 'can', 'ch', 'co', 'col', 'colu', 'ct', 'cto', 'ctor', 'cu',
    'cus', 'cust', 'da', 'dat', 'data', 'de', 'der', 'dow', 'eam', 'ec', 'ect',
    'ecto', 'er', 'erg', 'erge', 'fast', 'fi', 'fil', 'filt', 'ge', 'gg',
    'grou', 'ha', 'has', 'hash', 'il', 'ilt', 'ilte', 'in', 'ind', 'indo',
    'ine', 'jo', 'joi', 'join', 'key', 'le', 'li', 'lin', 'line', 'll', 'lo',
    'low', 'lt', 'lte', 'lter', 'lu', 'lue', 'lum', 'lumn', 'ma', 'mal',
    'mall', 'me', 'mer', 'merg', 'mn', 'ndo', 'ndow', 'ne', 'oi', 'oin', 'ol',
    'olu', 'olum', 'om', 'ome', 'omer', 'or', 'ord', 'orde', 'ow', 'pa', 'par',
    'park', 'part', 'quer', 'rd', 'rde', 'rder', 'rea', 'ream', 'rg', 'rge',
    'ro', 'roup', 'row', 'rt', 'sc', 'sca', 'scan', 'sh', 'sl', 'slo', 'slow',
    'sm', 'sma', 'smal', 'sort', 'spar', 'st', 'sto', 'stom', 'str', 'stre',
    'ta', 'tab', 'tabl', 'tc', 'tch', 'te', 'ter', 'to', 'tom', 'tome', 'tor',
    'tre', 'trea', 'ue', 'uery', 'um', 'umn', 'up', 'us', 'ust', 'usto', 'va',
    'val', 'valu', 've', 'vec', 'vect', 'win', 'wind',
]
