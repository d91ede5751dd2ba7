"""Structured-file sources: JSONL and CSV with the same dead-letter contract
as the log parsers.

The reference reads only raw text logs; a standalone engine also owes its
users schema'd semi-structured ingest. Design rules carried over from the
log path (SURVEY.md §1.5):

* **Schema declared up front** — never inferred. Inference runs an extra
  sampling job over the source (a second full scan of a 100 TB corpus at
  worst) and produces layout-dependent types.
* **Malformed rows are dead-lettered, not dropped**: PERMISSIVE mode with
  ``columnNameOfCorruptRecord`` keeps the raw text of any unparseable
  record in an ``error_line`` column — identical contract to the log
  parsers, so downstream audit queries (`error_line IS NOT NULL`) work on
  every source uniformly.
* Everything stays in the JVM scan operator: JSON/CSV decoding is
  vectorized inside FileSourceScanExec; no Python, no shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType


def _with_dead_letter(schema: StructType) -> StructType:
    """Schema + the corrupt-record capture column."""
    return StructType(list(schema.fields) + [StructField("error_line", StringType(), True)])


def read_jsonl(
    spark: SparkSession, paths: str | Sequence[str], schema: StructType
) -> DataFrame:
    """JSON-lines with explicit schema; malformed lines -> ``error_line``.

    A record that parses but misses fields gets NULLs (JSON is sparse by
    nature); only syntactically-broken lines dead-letter.

    Built as ``read.text`` + ``from_json`` — the same one-pass
    native-expression design as the log parsers — rather than
    ``read.json`` with ``columnNameOfCorruptRecord``: Spark forbids
    querying the corrupt-record column of a raw JSON scan without caching
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and caching a 100 TB ingest to
    audit its dead letters is not a real option. ``from_json`` in
    PERMISSIVE mode parses broken syntax to all-null fields (not a null
    struct), so corruption is captured by declaring the corrupt-record
    field INSIDE the from_json schema — that field carries the raw line
    exactly when parsing failed: the dead-letter branch.
    """
    if isinstance(paths, str):
        paths = [paths]
    line = F.col("value")
    parsed = F.from_json(
        line, _with_dead_letter(schema), {"columnNameOfCorruptRecord": "error_line"}
    )
    cols = [parsed[f.name].alias(f.name) for f in schema.fields]
    cols.append(parsed["error_line"].alias("error_line"))
    return (
        spark.read.text(list(paths))
        .where(F.length(F.trim(line)) > 0)
        .select(*cols)
    )


def read_csv(
    spark: SparkSession,
    paths: str | Sequence[str],
    schema: StructType,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """CSV with explicit schema; malformed rows -> ``error_line``.

    Wrong-arity rows and un-castable fields dead-letter with the raw line
    preserved (Spark requires the corrupt column nullable-string in the
    declared schema — appended automatically).
    """
    if isinstance(paths, str):
        paths = [paths]
    return (
        spark.read.schema(_with_dead_letter(schema))
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "error_line")
        .csv(list(paths))
    )


def dead_letter_stats(df: DataFrame) -> DataFrame:
    """Uniform ingest-quality summary for any dead-letter-bearing source."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("error_line").alias("n_dead_letters"),
    )


def read_binary_blobs(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Multimodal blob ingest via Spark's ``binaryFile`` source: one row per
    file with (path, modificationTime, length, content binary).

    This is the ingestion end of the multimodal pipeline (image/audio/video
    files on object storage -> binary column + metadata), feeding the
    Arrow-batched extractors in operators/multimodal.py. Scale notes:

    * The JVM reader streams file bytes straight into the ``content``
      column — no Python, no driver transit; partition planning packs
      small files per ``maxPartitionBytes`` like any file scan.
    * Filter on ``length``/``path`` BEFORE touching ``content``: those
      metadata columns come from the file listing, and a pushed
      ``length < N`` filter skips oversized blobs without reading them
      (spark.sql.sources.binaryFile.maxLength guards the hard cap).
    * For corpora of many tiny blobs, compact into parquet with a binary
      column (write once, scan forever) rather than re-listing millions of
      objects per job — the same small-files economics as the log path.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)
