"""S3/S4 sinks: JSONL round-trip + Label-Studio prediction contract."""

import json

from pyspark.sql import functions as F

from spanluke_spark.etl.annotations import (
    convert_documents,
    read_labelstudio,
    to_labelstudio_predictions,
    write_tokenized_jsonl,
)
from spanluke_spark.fixtures import TOKEN_GAZETTEER
from spanluke_spark.pipeline import extract_mentions_token

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"


def test_jsonl_sink_roundtrip(spark, tmp_path):
    docs, anns = read_labelstudio(spark, DEV_JSON)
    conv = convert_documents(docs.limit(50), anns)
    out = str(tmp_path / "tokens_jsonl")
    write_tokenized_jsonl(conv, out)
    back = spark.read.json(out)
    assert back.count() == conv.count()
    # schema + content survive the round trip
    a = {
        (r.document_id, r.sentence_id): (list(r.tokens), list(r.ner_tags))
        for r in conv.collect()
    }
    b = {
        (r.document_id, r.sentence_id): (list(r.tokens), list(r.ner_tags))
        for r in back.collect()
    }
    assert a == b


def test_labelstudio_prediction_contract(spark, sf_dir, tmp_path):
    """Output records must carry the exact reference shape
    (legal_ner/inference.py:160-175): value{start,end,text,labels}, id='i-j',
    from_name/to_name/type constants."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    mentions = extract_mentions_token(docs, ["doc_id"], TOKEN_GAZETTEER)
    preds = to_labelstudio_predictions(mentions)
    out = str(tmp_path / "preds_json")
    preds.write.mode("overwrite").json(out)
    rows = [json.loads(line) for line in spark.read.text(out).toPandas()["value"]]
    assert rows
    raw_text = {r.doc_id: r.text for r in docs.collect()}
    seen_j = {}
    for rec in rows:
        assert set(rec) == {"doc_id", "value", "id", "from_name", "to_name", "type"}
        assert rec["from_name"] == "label" and rec["to_name"] == "text"
        assert rec["type"] == "labels"
        v = rec["value"]
        assert set(v) == {"start", "end", "text", "labels"} and len(v["labels"]) == 1
        # text invariant: value.text == text[start:end] (inference.py:166)
        assert raw_text[rec["doc_id"]][v["start"] : v["end"]] == v["text"]
        doc, j = rec["id"].rsplit("-", 1)
        seen_j.setdefault(doc, []).append(int(j))
    # per-doc ids are 0..k-1 (enumeration order)
    for doc, js in seen_j.items():
        assert sorted(js) == list(range(len(js)))
