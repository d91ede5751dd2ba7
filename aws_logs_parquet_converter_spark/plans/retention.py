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


def expire_date_partitions(
    spark: SparkSession,
    dest_root: str,
    keep_from,
    hive: bool = False,
) -> list[str]:
    """Expire whole DAY directories below ``dest_root`` older than
    ``keep_from`` (a ``datetime.date``), for both layouts the compactor
    writes (``plans/compact.py`` O15): plain ``YYYY/MM/DD`` nesting and
    hive ``year=YYYY/month=MM/day=DD``. Returns expired days as ISO
    strings.

    The walk is 3 levels of ``listStatus`` — O(years + months-touched +
    days-touched) driver metadata. Year and month levels prune early
    (a 2023 subtree under a 2024 horizon is deleted wholesale without
    listing its days), so a 10-year backlog expiry costs tens of list
    calls, not thousands.
    """
    from datetime import date as _date

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(dest_root)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []

    def seg_value(name: str, prefix: str) -> int | None:
        if hive:
            if not name.startswith(prefix + "="):
                return None
            name = name[len(prefix) + 1 :]
        try:
            return int(name)
        except ValueError:
            return None

    expired: list[str] = []
    for ydir in fs.listStatus(root):
        if not ydir.isDirectory():
            continue
        y = seg_value(ydir.getPath().getName(), "year")
        if y is None:
            continue
        if y < keep_from.year:  # whole year below horizon: one delete
            fs.delete(ydir.getPath(), True)
            expired.append(f"{y:04d}")
            continue
        if y > keep_from.year:
            continue
        for mdir in fs.listStatus(ydir.getPath()):
            if not mdir.isDirectory():
                continue
            m = seg_value(mdir.getPath().getName(), "month")
            if m is None:
                continue
            if m < keep_from.month:
                fs.delete(mdir.getPath(), True)
                expired.append(f"{y:04d}-{m:02d}")
                continue
            if m > keep_from.month:
                continue
            for ddir in fs.listStatus(mdir.getPath()):
                if not ddir.isDirectory():
                    continue
                d = seg_value(ddir.getPath().getName(), "day")
                if d is None:
                    continue
                try:
                    if _date(y, m, d) >= keep_from:
                        continue
                except ValueError:  # e.g. a stray day=32 dir: leave it
                    continue
                fs.delete(ddir.getPath(), True)
                expired.append(f"{y:04d}-{m:02d}-{d:02d}")
    return sorted(expired)


def list_month_dirs(
    spark: SparkSession, dest_root: str, hive: bool = False
) -> list[str]:
    """MONTH-level directories of a compacted date tree (full URIs), for
    both layouts ``plans/compact.py`` writes (plain ``YYYY/MM`` and hive
    ``year=YYYY/month=MM``). Two levels of driver-side ``listStatus``,
    numeric segments only — each returned directory's children are the
    DAY partitions, i.e. the right root for a per-day maintenance sweep
    (``plans/optimize.py`` via the CLI's ``--optimize-after``)."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(dest_root)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []

    def seg_value(name: str, prefix: str) -> int | None:
        if hive:
            if not name.startswith(prefix + "="):
                return None
            name = name[len(prefix) + 1 :]
        try:
            return int(name)
        except ValueError:
            return None

    out: list[str] = []
    for ydir in fs.listStatus(root):
        if not ydir.isDirectory():
            continue
        if seg_value(ydir.getPath().getName(), "year") is None:
            continue
        for mdir in fs.listStatus(ydir.getPath()):
            if not mdir.isDirectory():
                continue
            if seg_value(mdir.getPath().getName(), "month") is None:
                continue
            out.append(str(mdir.getPath().toString()))
    return sorted(out)
