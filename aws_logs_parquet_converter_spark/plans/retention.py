"""Partition retention sweep: the data-lifecycle half of the compaction story.

The reference pipeline writes one dated partition per day forever
(``converters/s3-server-access-log/s3_server_access_logs.py:445-463`` —
destinations accrete daily); its users manage expiry out-of-band (S3
lifecycle rules on the destination prefix). A self-contained engine needs
the same capability as a first-class operation: drop partitions older than
a retention horizon WITHOUT touching — or even listing — the survivors.

Design (the only shape that scales to a 3650-partition, 100 TB table):

* The sweep is a DRIVER-SIDE METADATA operation: one ``listStatus`` of the
  partition root (O(#partitions), like the reference's folder discovery),
  value parsing in Python, and one recursive delete per expired partition.
  No Spark job runs; no data file is ever opened.
* Expiry is directory-granular — exactly the unit the writer commits
  (``partitionBy`` / dynamic overwrite), so a sweep can never split a
  partition or race a concurrent rewrite of a DIFFERENT partition.
* Survivor partitions are untouched (asserted by mtime in tests), so the
  sweep composes with readers: a concurrent ``WHERE day >= horizon`` query
  never sees a half-deleted partition it would have selected.
* Works on any Hadoop filesystem (``file://``, ``s3a://``): on object
  stores ``delete(recursive=True)`` maps to bulk key deletion, still
  O(files in expired partitions) server-side but zero data transfer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def list_partitions(
    spark: SparkSession, dest: str, partition_col: str
) -> list[str]:
    """Partition VALUES present under ``dest`` (hive layout ``col=value``),
    sorted. O(#partitions) driver-side metadata; no data files touched."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(dest)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    prefix = f"{partition_col}="
    return sorted(
        st.getPath().getName()[len(prefix):]
        for st in fs.listStatus(path)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )


def expire_partitions(
    spark: SparkSession,
    dest: str,
    partition_col: str,
    keep_from: str,
) -> list[str]:
    """Delete every ``partition_col=<value>`` directory with value
    lexicographically BELOW ``keep_from``; returns the expired values.

    Lexicographic comparison is correct for the layouts this engine
    writes: zero-padded ISO dates (``2024-01-07``), ``yyyyMMdd`` ints,
    and Hive year/month/day segments all sort textually in time order.
    Idempotent: re-running with the same horizon deletes nothing.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(dest)
    fs = root.getFileSystem(hconf)
    expired = [v for v in list_partitions(spark, dest, partition_col) if v < keep_from]
    for v in expired:
        fs.delete(jvm.org.apache.hadoop.fs.Path(dest, f"{partition_col}={v}"), True)
    return expired
