"""Iceberg-seam contract (VERDICT r3 action item 8).

No Iceberg runtime jar ships in this sandbox, so the catalog branch of the
table seam can't execute against a real catalog here. These tests pin its
CALL CONTRACT with a recording fake: which DataFrameWriterV2 / reader calls
fire, with which arguments, for each mode — so a real-cluster deploy (where
`get_spark(extra_conf={"spark.sql.catalog...": ...})` flips the branch on)
can't drift silently.
"""

import pytest

from spanluke_spark.storage.tables import (
    _is_catalog_ref,
    iceberg_partition_spec,
    read_table,
    write_table,
)


class RecordingWriterV2:
    def __init__(self, log, ref):
        self.log = log
        self.ref = ref

    def partitionedBy(self, *transforms):
        self.log.append(("partitionedBy", [str(t) for t in transforms]))
        return self

    def append(self):
        self.log.append(("append", self.ref))

    def createOrReplace(self):
        self.log.append(("createOrReplace", self.ref))


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [("u1", "<p>x</p>")], "url string, html string"
    )


def test_ref_classifier():
    assert _is_catalog_ref("cc.db.pages")
    assert not _is_catalog_ref("/tmp/pages")
    assert not _is_catalog_ref("db.pages")  # needs catalog.db.table


def test_append_contract(monkeypatch, df):
    log = []
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, ref: RecordingWriterV2(log, ref)
    )
    write_table(df, "cc.db.pages", mode="append")
    assert log == [("append", "cc.db.pages")]


def test_create_or_replace_with_partition_transforms(monkeypatch, df):
    log = []
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, ref: RecordingWriterV2(log, ref)
    )
    spec = iceberg_partition_spec(
        bucket_col="url", n_buckets=64, day_col="warc_ts"
    )
    write_table(df, "cc.db.pages", mode="overwrite", partition_transforms=spec)
    assert [op for op, _ in log] == ["partitionedBy", "createOrReplace"]
    transforms = log[0][1]
    # the exact north-star spec: bucket(64, url) + days(warc_ts)
    assert len(transforms) == 2
    assert "bucket" in transforms[0] and "url" in transforms[0]
    assert "days" in transforms[1] and "warc_ts" in transforms[1]


def test_partition_spec_column_expressions():
    spec = iceberg_partition_spec(bucket_col="url", n_buckets=16, day_col="warc_ts")
    assert len(spec) == 2
    s0, s1 = str(spec[0]), str(spec[1])
    assert "bucket" in s0 and "16" in s0 and "url" in s0
    assert "days" in s1 and "warc_ts" in s1
    assert iceberg_partition_spec() == []


def test_read_contract(monkeypatch, spark):
    calls = []
    reader_cls = type(spark.read)

    def fake_table(self, ref):
        calls.append(ref)
        # return an empty df so the call completes without a catalog
        return spark.createDataFrame([], "url string")

    monkeypatch.setattr(reader_cls, "table", fake_table)
    out = read_table(spark, "cc.db.pages")
    assert calls == ["cc.db.pages"]
    assert out.columns == ["url"]


def test_parquet_fallback_writes_partitioned(df, tmp_path, spark):
    path = str(tmp_path / "pages")
    write_table(
        df.withColumn("part_key", df.url.substr(1, 1)),
        path,
        mode="overwrite",
        partition_by=["part_key"],
    )
    back = read_table(spark, path)
    assert back.count() == 1 and "part_key" in back.columns
