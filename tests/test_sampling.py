"""Deterministic-sampling semantics: total coverage, disjointness, stability."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.catalog import load_table
from aws_logs_parquet_converter_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    hash_split,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hash_split_partitions_every_row(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total = docs.count()
    split = hash_split(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == total  # every row in exactly one split
    assert set(counts) == {"train", "val", "test"}
    # 80/10/10 within a loose tolerance at this scale
    assert counts["train"] / total > 0.6
    assert counts["val"] / total < 0.25
    assert counts["test"] / total < 0.25


def test_hash_split_stable_under_repartition(spark):
    docs = load_table(spark, SF_DIR, "documents")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(16), "doc_id").select("doc_id", "split").collect()
    }
    assert a == b  # assignment is a pure function of the key


def test_hash_sample_is_subset_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    s1 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect())
    s2 = sorted(r["doc_id"] for r in hash_sample(docs, "doc_id", 10).select("doc_id").collect())
    assert s1 == s2
    # ~10%: loose bounds to avoid fixture-size flakes
    n = docs.count()
    assert 0.02 * n < len(s1) < 0.25 * n
    # monotone: a 20% sample contains the 10% sample
    s20 = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 20).select("doc_id").collect())
    assert set(s1) <= s20


def test_hash_bucket_range(spark):
    docs = load_table(spark, SF_DIR, "documents")
    row = docs.select(
        F.min(hash_bucket("doc_id")).alias("lo"), F.max(hash_bucket("doc_id")).alias("hi")
    ).collect()[0]
    assert row["lo"] >= 0 and row["hi"] < 100
