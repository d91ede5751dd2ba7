"""Deduplication operators over the ``documents`` table.

Training-data pipeline staples: exact dedup now; MinHash-LSH, SimHash and
n-gram Jaccard variants build on the same shingling/hashing primitives
(functions/text.py). All hashing is md5-derived so DuckDB oracles can compute
the identical values (md5 exists in both engines; Spark's xxhash64/murmur are
not portable).

Scale: exact dedup is a single hash-aggregate on a fingerprint — the shuffle
key is the 128-bit digest, never the document body, so shuffle volume is
O(rows), not O(bytes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from . import register


def exact_dedup_keys(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: fingerprint, canonical (min) id, dup count."""
    fp = F.md5(F.col(text_col).cast("binary")).alias("fingerprint")
    return (
        docs.select(fp, F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup: md5-fingerprint hash-aggregate, canonical id = min(doc_id).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_keys(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_only_dupes",
    oracle="""
    SELECT md5(text) AS fingerprint, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
    """,
    doc="Duplicate clusters only (HAVING over the dedup aggregate).",
)
def dedup_exact_only_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_keys(load_table(spark, sf_dir, "documents")).where(F.col("n_copies") > 1)
