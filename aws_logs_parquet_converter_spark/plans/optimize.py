"""Table OPTIMIZE: bin-pack a partitioned parquet table's small files.

The reference's compaction solves small files at INGEST time (many tiny
log objects -> few parquet files, ``s3_server_access_logs.py:395-463``);
a long-lived lake also accretes small files AFTER ingest — streaming
micro-batches (each ``stream_upsert_merge`` batch commits a file per
touched partition), partition-scoped upserts, late-day repairs. This is
the maintenance half: the OPTIMIZE/rewrite operation systems like Delta
and Iceberg ship, for plain parquet directories.

Design (what survives a 3650-partition, 100 TB table):

* **Selection is driver-side metadata**: one ``listStatus`` per partition
  directory (O(#partitions + #files), no data read) classifies each
  partition by file count and size; only partitions with more than
  ``target`` files AND an average file size below ``small_file_mb`` are
  rewritten. A well-packed partition is never touched — the sweep is
  idempotent and incremental by construction.
* **Rewrite is per-partition and atomic-by-rename**: each selected
  partition is read, coalesced to ``ceil(bytes / target_file_mb)`` files
  (the same size-aware rule as ingest compaction,
  ``compact.resolve_file_count``), written to a sibling temp dir, then
  swapped in with two renames. Readers see the old files or the new —
  never a mix; a crash before the swap leaves the table untouched.
* **Only touched partitions shuffle**: work is proportional to the bytes
  in SELECTED partitions, never table size. Partitions rewrite
  independently, so the loop parallelizes across a scheduler pool or
  days without coordination.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class PartitionStats:
    value: str
    path: str
    n_files: int
    total_bytes: int


def partition_file_stats(
    spark: SparkSession, dest: str, partition_col: str
) -> list[PartitionStats]:
    """Per-partition (file count, byte total) via driver-side listStatus —
    no data files opened, O(#partitions + #files) metadata calls."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(dest)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []
    prefix = f"{partition_col}="
    out: list[PartitionStats] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        n, total = 0, 0
        for f in fs.listStatus(st.getPath()):
            fname = f.getPath().getName()
            if f.isFile() and not fname.startswith("_") and not fname.startswith("."):
                n += 1
                total += f.getLen()
        out.append(
            PartitionStats(
                value=name[len(prefix):],
                path=str(st.getPath().toUri().getPath()),
                n_files=n,
                total_bytes=int(total),
            )
        )
    return sorted(out, key=lambda p: p.value)


def select_partitions_to_optimize(
    stats: list[PartitionStats],
    target_file_mb: int = 128,
    min_files: int = 2,
) -> list[PartitionStats]:
    """Partitions worth rewriting: more files than their bytes need at
    ``target_file_mb`` (and at least ``min_files``). A partition already
    at its target count is skipped, which makes repeated OPTIMIZE runs
    no-ops — the idempotence a scheduled maintenance job needs."""
    picked = []
    for p in stats:
        want = max(1, math.ceil(p.total_bytes / (target_file_mb * 1024 * 1024)))
        if p.n_files >= min_files and p.n_files > want:
            picked.append(p)
    return picked


def optimize_partitions(
    spark: SparkSession,
    dest: str,
    partition_col: str,
    target_file_mb: int = 128,
    min_files: int = 2,
) -> list[str]:
    """Bin-pack every small-file partition of ``dest``; returns the
    partition values rewritten. Content-preserving (tests assert the
    table reads back identically) and atomic per partition via
    write-to-temp + two renames."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(dest).getFileSystem(hconf)
    done: list[str] = []
    for p in select_partitions_to_optimize(
        partition_file_stats(spark, dest, partition_col), target_file_mb, min_files
    ):
        want = max(1, math.ceil(p.total_bytes / (target_file_mb * 1024 * 1024)))
        tmp = f"{p.path}__optimize_tmp"
        old = f"{p.path}__optimize_old"
        # coalesce, not repartition: packing files needs no shuffle, only
        # fewer output tasks over the partition's existing splits
        spark.read.parquet(p.path).coalesce(want).write.mode("overwrite").parquet(tmp)
        jp = jvm.org.apache.hadoop.fs.Path(p.path)
        jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
        jold = jvm.org.apache.hadoop.fs.Path(old)
        # Hadoop rename() reports failure by RETURN VALUE, not exception; a
        # crashed prior run can also leave the __optimize_old residue, which
        # would make the swap silently no-op. Clear it, then check each step.
        if fs.exists(jold):
            fs.delete(jold, True)
        if not fs.rename(jp, jold):
            raise IOError(f"optimize: could not move {p.path} aside")
        if not fs.rename(jtmp, jp):
            fs.rename(jold, jp)  # roll the live partition back
            raise IOError(f"optimize: could not swap in rewrite for {p.path}")
        fs.delete(jold, True)
        done.append(p.value)
    return done
