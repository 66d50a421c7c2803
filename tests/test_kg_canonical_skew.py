"""Composed pipeline with canonicalization + explicit skew handling checks."""

from pyspark.sql import functions as F

from spanluke_spark.etl.pages import synthesize_pages
from spanluke_spark.fixtures import PIPELINE_GAZETTEER
from spanluke_spark.kg import read_triples, run_kg_pipeline
from spanluke_spark.link.alias import salted_count


def test_kg_pipeline_with_canonicalization(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    pages = synthesize_pages(docs)
    alias_df = spark.createDataFrame(
        [("hash join", 10, "Hash Join", "COURT", 0.9), ("spark", 12, "Apache Spark", "ORG", 0.9)],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )
    out = str(tmp_path / "kg_canon")
    r = run_kg_pipeline(
        spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="c1", canonicalize=True
    )
    assert r["n_pages"] == 150 and r["n_triples"] > 0
    t = read_triples(spark, out)
    # canonicalization must not create duplicate (subj,pred,obj,url) rows
    assert t.count() == t.dropDuplicates(["subj", "pred", "obj", "url"]).count()
    # linked entity subjects survive
    assert t.filter(F.col("subj") == "ent:12").count() > 0
    # canonical subjects are cluster minima: re-canonicalizing is a no-op
    from spanluke_spark.canon.canonicalize import canonicalize_entities

    mapping = canonicalize_entities(t)
    assert mapping.filter(F.col("key") != F.col("canonical_key")).count() == 0


def test_salted_aggregation_balances_hot_key(spark):
    """A synthetic 90%-hot-key workload: the salted partial aggregation must
    split the hot key across salt buckets (the explicit skew mechanism of the
    north_rule), while preserving exact counts."""
    n = 20_000
    df = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit("supreme court"))
        .otherwise(F.concat(F.lit("rare"), (F.col("id") % 97).cast("string")))
        .alias("surface"),
        F.col("id").alias("mention_id"),
    )
    # exact counts preserved
    got = {r.surface: r.n for r in salted_count(df, ["surface"], 16, "mention_id").collect()}
    assert got["supreme court"] == n * 9 // 10

    # the partial stage spreads the hot key over >1 salt bucket
    partial = (
        df.groupBy(
            "surface",
            F.pmod(F.xxhash64("mention_id"), F.lit(16)).alias("salt"),
        )
        .count()
        .filter(F.col("surface") == "supreme court")
    )
    n_buckets = partial.count()
    assert n_buckets == 16  # hot key fanned out across all salt buckets
    sizes = [r["count"] for r in partial.collect()]
    assert max(sizes) < (n * 9 // 10) * 0.2  # no bucket holds the whole key
