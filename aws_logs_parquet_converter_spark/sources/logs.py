"""Log-file sources.

The reference ingests S3 objects with a driver-side listing + boto3 reads
inside ``flatMap`` (``s3_server_access_logs.py:86-141,395-401``) — an opaque
PythonRDD that Catalyst can't see through. Spark-native replacement:
``spark.read.text`` over a path/glob list. FileSourceScanExec handles split
planning, small-file packing (``spark.sql.files.openCostInBytes``), locality
and column pruning; the parse stays in whole-stage codegen.

At 100 TB the win is structural: no driver-side ListObjects loop (the file
index is distributed), no per-file boto3 client, no JVM<->Python row hops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..functions.s3_log_parse import parse_s3_access_log_lines


def read_text_lines(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Raw lines (one ``value`` column). Accepts a path, glob, or list."""
    if isinstance(paths, str):
        paths = [paths]
    return spark.read.text(list(paths))


def read_s3_access_logs(spark: SparkSession, paths: str | Sequence[str]) -> DataFrame:
    """Read + parse S3 server-access logs into the typed 27-column table.

    Equivalent of the reference's list->parallelize->flatMap->createDataFrame
    chain (``s3_server_access_logs.py:389-401``) as a single declarative scan.
    """
    return parse_s3_access_log_lines(read_text_lines(spark, paths))
