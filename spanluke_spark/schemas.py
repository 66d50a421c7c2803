"""Declared schemas + the two label-vocabulary encodings.

The reference is schema-by-convention (Python dicts); here every DataFrame has
a declared StructType (SURVEY.md §1). The two inconsistent label encodings
(§1.3) are both derived from one canonical entity list so they can never drift.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Entity vocabularies (reference: legal_ner/main.py:249-275)
# ---------------------------------------------------------------------------

LEGALNER_ENTITIES = [
    "COURT",
    "PETITIONER",
    "RESPONDENT",
    "JUDGE",
    "DATE",
    "ORG",
    "GPE",
    "STATUTE",
    "PROVISION",
    "PRECEDENT",
    "CASE_NUMBER",
    "WITNESS",
    "OTHER_PERSON",
    "LAWYER",
]

ENER_ENTITIES = [
    "BUSINESS",
    "LOCATION",
    "PERSON",
    "GOVERNMENT",
    "COURT",
    "LEGACT",
    "MISCELLANEOUS",
]

OUTSIDE = "O"


def bio_labels(entities: list[str]) -> list[str]:
    """B-*/I-* expansion, reference order (legal_ner/main.py:277-279)."""
    return ["B-" + e for e in entities] + ["I-" + e for e in entities]


def encoding_a(entities: list[str]) -> dict[str, int]:
    """Training/inference-path encoding: labels sorted DESCENDING -> index.

    Replicates legal_ner/utils/dataset.py:27-32 and inference.py:25-32:
    ``dict(zip(sorted(labels)[::-1], range(n)))`` -> "O"->0, I-WITNESS->1, ...
    """
    labels = sorted(bio_labels(entities) + [OUTSIDE])[::-1]
    return dict(zip(sorted(labels)[::-1], range(len(labels))))


def encoding_b(entities: list[str]) -> dict[str, int]:
    """JSONL-ETL encoding: BIO labels sorted ASCENDING, 1-based, O=0.

    Replicates legal_ner/utils/convert_dataset.py:4-6.
    """
    tags = {e: i + 1 for i, e in enumerate(sorted(bio_labels(entities)))}
    tags[OUTSIDE] = 0
    return tags


def idx_to_label(encoding: dict[str, int]) -> dict[int, str]:
    return {v: k for k, v in encoding.items()}


# ---------------------------------------------------------------------------
# Core DataFrame schemas
# ---------------------------------------------------------------------------

# Graft input (BASELINE.json input_hint): Common-Crawl-style page table.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Flattened Label-Studio document (reference shape: legal_ner/utils/dataset.py:38-49).
DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("file_order", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

ANNOTATIONS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ann_order", T.IntegerType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),  # end-exclusive char offset
        T.StructField("label", T.StringType(), False),
        T.StructField("surface", T.StringType(), True),
    ]
)

# Word-token JSONL record (legal_ner/utils/convert_dataset.py:46-49).
TOKENIZED = T.StructType(
    [
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
        T.StructField("ner_tags", T.ArrayType(T.IntegerType()), False),
        T.StructField("document_id", T.LongType(), True),
        T.StructField("sentence_id", T.LongType(), True),
    ]
)

# One token with char offsets (end-exclusive), Python str.split() semantics.
TOKEN = T.StructType(
    [
        T.StructField("token", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# Mention/prediction record (output contract, legal_ner/inference.py:160-175).
MENTIONS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("sent_id", T.LongType(), True),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
        T.StructField("surface", T.StringType(), True),
        T.StructField("label", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
    ]
)

LINKED = T.StructType(
    MENTIONS.fields
    + [
        T.StructField("canonical_id", T.LongType(), True),
        T.StructField("canonical_name", T.StringType(), True),
    ]
)

TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("start", T.IntegerType(), True),
        T.StructField("end", T.IntegerType(), True),
    ]
)

ALIAS_DICT = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("canonical_id", T.LongType(), False),
        T.StructField("canonical_name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
        T.StructField("prior", T.DoubleType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("part_key", T.IntegerType(), False),
        T.StructField("n_pages", T.LongType(), False),
        T.StructField("n_mentions", T.LongType(), False),
        T.StructField("n_triples", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("completed_at", T.TimestampType(), False),
    ]
)
