"""End-to-end first mile: WARC crawl files -> HTML extraction -> the
resumable legal-facts pipeline. The authentic Common-Crawl ingest path
feeding the legal KG, crossing every seam (binaryFile parse, HTML strip,
one-pass lanes, partition lineage)."""

from __future__ import annotations

from datetime import datetime, timezone

from spanluke_spark.etl.extract import extract_text
from spanluke_spark.etl.warc import encode_warc, read_warc
from spanluke_spark.kg import read_legal_facts, run_legal_facts_pipeline

_BODY = (
    "<html><head><title>Judgment</title>"
    "<style>p {{ color: black }}</style></head><body>"
    "<h1>IN THE SUPREME COURT OF INDIA</h1>"
    "<p>Criminal Appeal No. {n} of 2001. he was convicted u/s 302 IPC.</p>"
    "<p>order dated 25.03.2004. the appeal is allowed.</p>"
    "</body></html>"
)


def test_warc_to_facts(spark, tmp_path):
    warc_dir = tmp_path / "warc"
    warc_dir.mkdir()
    ts = datetime(2024, 3, 1, tzinfo=timezone.utc)
    records = [
        (f"https://court.example/case/{i}", ts, _BODY.format(n=i + 1).encode())
        for i in range(6)
    ]
    (warc_dir / "crawl-00.warc.gz").write_bytes(
        encode_warc(records, gzip_per_record=True)
    )

    pages = extract_text(read_warc(spark, str(warc_dir)))
    out = str(tmp_path / "kg")
    stats = run_legal_facts_pipeline(spark, pages, out, run_id="warc1")
    assert stats["n_pages"] == 6

    facts = read_legal_facts(spark, out)
    one = {
        (r.pred, r.obj)
        for r in facts.where(
            facts.url == "https://court.example/case/0"
        ).collect()
    }
    assert ("heard_in", "supreme court of india") in one
    assert ("docketed_as", "criminalappeal:1:2001") in one
    assert ("charged_under", "IPC s.302") in one
    assert ("dated", "2004-03-25") in one
    assert ("disposed_as", "allowed") in one
    # style block must not leak into the extracted text / facts
    assert all("color" not in obj for _, obj in one)

    # rerun is a no-op: lineage covers every partition
    stats2 = run_legal_facts_pipeline(spark, pages, out, run_id="warc2")
    assert stats2 == {"n_pages": 0, "n_facts": 0}
