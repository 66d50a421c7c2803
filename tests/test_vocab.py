"""Label-vocabulary encodings (SURVEY.md §1.3) — the two-encodings trap."""

from spanluke_spark.schemas import (
    ENER_ENTITIES,
    LEGALNER_ENTITIES,
    bio_labels,
    encoding_a,
    encoding_b,
    idx_to_label,
)


def test_encoding_a_legalner():
    enc = encoding_a(LEGALNER_ENTITIES)
    assert len(enc) == 29  # 2*14 + 1 (legal_ner/main.py:280)
    assert enc["O"] == 0
    assert enc["I-WITNESS"] == 1
    assert enc["B-CASE_NUMBER"] == 28
    assert sorted(enc.values()) == list(range(29))


def test_encoding_b_legalner():
    enc = encoding_b(LEGALNER_ENTITIES)
    assert enc["O"] == 0
    assert enc["B-CASE_NUMBER"] == 1
    assert enc["B-COURT"] == 2
    # Verified against NER_DEV_ALL.jsonl: STATUTE token carries tag 13.
    assert enc["B-STATUTE"] == 13
    assert enc["I-WITNESS"] == 28


def test_roundtrip_and_ener():
    for ents in (LEGALNER_ENTITIES, ENER_ENTITIES):
        for enc in (encoding_a(ents), encoding_b(ents)):
            inv = idx_to_label(enc)
            assert all(enc[inv[i]] == i for i in inv)
            assert set(enc) == set(bio_labels(ents)) | {"O"}
