"""HTML->text determinism + pages synthesis (SURVEY §5.2.1, north_star byte-identity)."""

from spanluke_spark.etl.extract import extract_text, py_html_to_text
from spanluke_spark.etl.pages import expected_page_text, synthesize_pages


def test_py_html_to_text_basics():
    html = (
        b"<html><head><title>T</title><style>b{}</style><script>x</script></head>"
        b"<body><h1>Header</h1><p>Hello   <b>world</b> &amp; friends</p>"
        b"<div>foot</div></body></html>"
    )
    assert py_html_to_text(html) == "Header\nHello world & friends\nfoot"
    assert py_html_to_text(None) == ""
    assert py_html_to_text(b"") == ""
    # malformed markup must not raise
    assert isinstance(py_html_to_text(b"<div><p>unclosed <b>x"), str)
    # invalid utf-8 -> replacement, still deterministic
    assert py_html_to_text(b"<p>\xff\xfe ok</p>") == py_html_to_text(b"<p>\xff\xfe ok</p>")


def test_extract_text_byte_identical_across_partitionings(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    pages = synthesize_pages(docs)
    one = {
        r.url: r.text for r in extract_text(pages.coalesce(1)).collect()
    }
    many = {
        r.url: r.text for r in extract_text(pages.repartition(20)).collect()
    }
    assert one == many  # byte-identical per url, any parallelism
    assert "html" not in extract_text(pages).columns  # binary pruned


def test_extraction_matches_expected_template(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    raw = {r.doc_id: r.text for r in docs.collect()}
    pages = synthesize_pages(docs)
    got = {r.url: r.text for r in extract_text(pages).collect()}
    for doc_id, text in raw.items():
        url = f"https://example.org/doc/{doc_id}"
        assert got[url] == expected_page_text(doc_id, text)
