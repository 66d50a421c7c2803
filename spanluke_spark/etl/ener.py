"""S2: E-NER (EDGAR) corpus loader as package API.

The reference reads the E-NER JSONL splits line-by-line into a HF Dataset
(legal_ner/utils/dataset.py:138-155) and derives the BIO tag vocabulary from
the 7 E-NER entity types (legal_ner/main.py:267-280). Here: a native
``spark.read.json`` NDJSON scan (distributed, schema-pruned) plus the same
deterministic tag vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# legal_ner/main.py:267-280 — the E-NER entity list, BIO-expanded.
ENER_ENTITIES = [
    "BUSINESS",
    "LOCATION",
    "PERSON",
    "GOVERNMENT",
    "COURT",
    "LEGACT",
    "MISCELLANEOUS",
]


def ener_label_list() -> list[str]:
    """["O", "B-<e>"..., "I-<e>"...] — id == list index, matching the
    reference's span_labels construction (main.py:277-280)."""
    labels = ["B-" + e for e in ENER_ENTITIES] + ["I-" + e for e in ENER_ENTITIES]
    return ["O"] + labels


def read_ener(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON scan of an E-NER split -> (tokens array<string>,
    ner_tags array<bigint>). Column-pruned at the source."""
    return spark.read.json(path).select("tokens", "ner_tags")


def ener_token_labels(df: DataFrame) -> DataFrame:
    """Explode to one row per token: (row_id, pos, token, tag_id, label).
    The BIO label string comes from the deterministic vocabulary — a
    broadcast-free array lookup (element_at on a literal array)."""
    vocab = F.array(*[F.lit(x) for x in ener_label_list()])
    base = df.select(
        F.monotonically_increasing_id().alias("row_id"),
        F.arrays_zip(
            F.col("tokens").alias("token"), F.col("ner_tags").alias("tag_id")
        ).alias("z"),
    )
    return base.select(
        "row_id", F.posexplode("z").alias("pos", "t")
    ).select(
        "row_id",
        "pos",
        F.col("t.token").alias("token"),
        F.col("t.tag_id").cast("int").alias("tag_id"),
        F.element_at(vocab, F.col("t.tag_id").cast("int") + 1).alias("label"),
    )
