"""JSONL / CSV structured sources: explicit schemas, uniform dead-letter
contract (error_line), and alternate sink formats on the compaction path."""

import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aws_logs_parquet_converter_spark.plans.compact import (
    CompactionPolicy,
    write_compacted,
)
from aws_logs_parquet_converter_spark.sources.generator import write_log_files
from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs
from aws_logs_parquet_converter_spark.sources.structured import (
    dead_letter_stats,
    read_csv,
    read_jsonl,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)


def test_jsonl_schema_and_dead_letter(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 1, "name": "a", "score": 0.5}\n'
        '{"id": 2, "name": "b"}\n'  # sparse: missing field -> NULL, not dead
        "this is not json\n"
        '{"id": 3, "name": "c", "score": 1.5}\n'
    )
    df = read_jsonl(spark, str(p), SCHEMA)
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 4
    assert rows[1].score == 0.5
    assert rows[2].score is None and rows[2].error_line is None
    dead = [r for r in rows.values() if r.error_line is not None]
    assert len(dead) == 1 and dead[0].error_line == "this is not json"
    stats = dead_letter_stats(df).collect()[0]
    assert stats.n_rows == 4 and stats.n_dead_letters == 1


def test_csv_schema_and_dead_letter(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name,score\n1,a,0.5\n2,b,not_a_number\n3,c,2.5\n")
    df = read_csv(spark, str(p), SCHEMA)
    rows = sorted(df.collect(), key=lambda r: r.id)
    assert len(rows) == 3
    assert rows[0].error_line is None and rows[0].score == 0.5
    # un-castable field -> NULL value + raw line preserved
    assert rows[1].score is None and "not_a_number" in rows[1].error_line
    assert rows[2].error_line is None


def test_compaction_orc_sink(spark, tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "out")
    write_log_files(raw, n_lines=500, n_files=2, seed=4)
    parsed = read_s3_access_logs(spark, raw + "/*.txt")
    write_compacted(
        parsed, out, CompactionPolicy(num_output_files=2, output_format="orc")
    )
    back = spark.read.orc(out)
    assert back.count() == parsed.count()
    assert len([f for f in os.listdir(out) if f.endswith(".orc")]) == 2


def test_compaction_json_sink(spark, tmp_path):
    raw, out = str(tmp_path / "raw"), str(tmp_path / "out")
    write_log_files(raw, n_lines=300, n_files=2, seed=5)
    parsed = read_s3_access_logs(spark, raw + "/*.txt")
    write_compacted(
        parsed,
        out,
        CompactionPolicy(
            num_output_files=1, output_format="json", compression="gzip"
        ),
    )
    back = spark.read.json(out)
    assert back.count() == parsed.count()


def test_binary_blob_ingest_feeds_multimodal_extract(spark, tmp_path):
    """binaryFile source -> mapInArrow feature extraction end-to-end: bytes
    survive ingestion exactly (md5 parity with the on-disk files)."""
    import hashlib

    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.operators.multimodal import (
        binary_feature_extract_arrow,
    )
    from aws_logs_parquet_converter_spark.sources.structured import read_binary_blobs

    blobs = {f"b{i}.bin": bytes([i]) * (100 + i) for i in range(5)}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)

    df = read_binary_blobs(spark, str(tmp_path), glob="*.bin")
    assert df.count() == 5
    named = df.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.xxhash64(F.element_at(F.split("path", "/"), -1)).alias("doc_id"),
        F.col("content").alias("payload"),
    )
    feats = binary_feature_extract_arrow(named.select("doc_id", "payload"))
    got = {
        r.name: (r.byte_len, r.digest)
        for r in feats.join(named.select("doc_id", "name"), "doc_id").collect()
    }
    for name, data in blobs.items():
        assert got[name] == (len(data), hashlib.md5(data).hexdigest())
