"""Table OPTIMIZE: bin-pack a partitioned parquet table's small files.

The reference's compaction solves small files at INGEST time (many tiny
log objects -> few parquet files, ``s3_server_access_logs.py:395-463``);
a long-lived lake also accretes small files AFTER ingest — streaming
micro-batches (each ``stream_upsert_merge`` batch commits a file per
touched partition), partition-scoped upserts, late-day repairs. This is
the maintenance half: the OPTIMIZE/rewrite operation systems like Delta
and Iceberg ship, for plain parquet directories.

Design (what survives a 3650-partition, 100 TB table):

* **Selection is driver-side metadata, O(1) bridge calls per partition**:
  one recursive ``getContentSummary`` per partition directory classifies
  it by file count and size (the sums accumulate JVM-side; standard job
  markers are tolerated and subtracted). Only partitions with more than
  ``target`` files AND more files than their bytes need are rewritten. A
  well-packed partition is never touched — the sweep is idempotent and
  incremental by construction.
* **Rewrite is per-partition and swap-by-rename**: each selected
  partition is read, coalesced to ``ceil(bytes / target_file_mb)`` files
  (the same size-aware rule as ingest compaction,
  ``compact.resolve_file_count``), written to a DOT-PREFIXED sibling temp
  dir (hidden from Spark/Hive partition discovery, so a concurrent
  table-root read never sees it as a partition), then swapped in with two
  renames. Readers never observe a MIX of old and new files; there is,
  however, an instant between the two renames where the partition path
  does not exist, and a reader that listed files before the swap can hit
  deleted-file errors mid-scan — full concurrent-reader isolation is what
  a manifest layer (Delta/Iceberg) buys and plain directories cannot.
  Run OPTIMIZE on partitions that are not being actively queried/written
  (the scheduled "pack yesterday" pattern).
* **Crash residue is recovered, not deleted**: every run first calls
  :func:`recover_optimize_residue` — a partition moved aside whose swap
  never completed is renamed back verbatim; an ambiguous state (both the
  live dir and a non-empty moved-aside copy exist, e.g. writers appended
  to the partition after a mid-swap crash) raises for operator
  reconciliation instead of guessing and destroying either copy.
* **Only touched partitions shuffle, and rewrites run concurrently**:
  work is proportional to the bytes in SELECTED partitions, never table
  size. Each partition rewrite is an independent Spark job; they are
  submitted from a thread pool (``max_concurrency``) under a dedicated
  scheduler pool, so a 1000-partition sweep is not 1000 serial job
  walls.
* **Stream-ingested layouts**: the streaming log path commits
  ``day=<d>/batch=<n>`` partitions (exactly-once bookkeeping,
  ``streaming/events.py: log_stream_merge_batch``). ``collapse``
  rewrites such a day into a single ``batch=-1`` leaf — same depth, so
  the table stays uniformly partitioned — folding the bookkeeping
  column while packing. Only optimize partitions the stream's
  checkpoint has moved past: a replayed batch id would recreate its
  ``batch=n`` dir beside the collapsed one and double its rows.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import SparkSession

OPT_TMP_SUFFIX = "__optimize_tmp"
OPT_OLD_SUFFIX = "__optimize_old"

# Job-level marker files Spark/Hadoop may leave in a written directory.
# Checked by name (O(1) bridge calls) so metadata sweeps stay O(#dirs).
_JOB_MARKERS = ("_SUCCESS", "_metadata", "_common_metadata")


class OptimizePartialFailure(IOError):
    """Some partition rewrites failed; the rest COMPLETED and their values
    are preserved on the exception so a sweep caller (e.g. the CLI
    ``--optimize-after`` walk) can report partial progress instead of
    silently discarding it. ``completed`` = sorted values rewritten OK;
    ``failed`` = [(partition value, exception), ...]."""

    def __init__(
        self,
        msg: str,
        completed: list[str],
        failed: list[tuple[str, Exception]],
    ) -> None:
        super().__init__(msg)
        self.completed = completed
        self.failed = failed


@dataclass(frozen=True)
class PartitionStats:
    value: str
    path: str  # full URI (scheme preserved — works off fs.defaultFS)
    n_files: int
    total_bytes: int
    nested: bool  # has sub-partition directories (e.g. day=X/batch=N)


def _fs_for(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jpath, jpath.getFileSystem(spark._jsc.hadoopConfiguration())


def _marker_stats(jvm, fs, dir_path) -> tuple[int, int]:
    """(count, bytes) of standard job markers directly under ``dir_path``."""
    n, total = 0, 0
    for m in _JOB_MARKERS:
        mp = jvm.org.apache.hadoop.fs.Path(dir_path, m)
        if fs.exists(mp):
            n += 1
            total += fs.getFileStatus(mp).getLen()
    return n, total


def partition_file_stats(
    spark: SparkSession, dest: str, partition_col: str | None
) -> list[PartitionStats]:
    """Per-partition (file count, byte total) via driver-side metadata —
    one recursive ``getContentSummary`` per partition (no data files
    opened, no per-file bridge calls), job markers subtracted. Counts the
    whole subtree, so nested sub-partition layouts (``day=X/batch=N``)
    are sized correctly. ``partition_col=None`` treats EVERY visible child
    directory as a partition — the reference's plain date layout
    (``<root>/2024-01-02/``), which has no ``col=`` prefix. Dot/underscore
    -prefixed and ``__optimize_``-suffixed directories (markers, in-flight
    or crashed rewrites) are never treated as partitions."""
    jvm, root, fs = _fs_for(spark, dest)
    if not fs.exists(root):
        return []
    prefix = f"{partition_col}=" if partition_col is not None else ""
    out: list[PartitionStats] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix)):
            continue
        if name.startswith(".") or name.startswith("_"):
            continue
        if OPT_TMP_SUFFIX in name or OPT_OLD_SUFFIX in name:
            continue  # residue from a pre-dot-prefix version of this op
        summ = fs.getContentSummary(st.getPath())
        mark_n, mark_bytes = _marker_stats(jvm, fs, st.getPath())
        out.append(
            PartitionStats(
                value=name[len(prefix):],
                path=str(st.getPath().toString()),
                n_files=int(summ.getFileCount()) - mark_n,
                total_bytes=int(summ.getLength()) - mark_bytes,
                # getDirectoryCount includes the root dir itself
                nested=int(summ.getDirectoryCount()) > 1,
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


def recover_optimize_residue(spark: SparkSession, dest: str) -> list[str]:
    """Repair crash residue from an interrupted OPTIMIZE before doing any
    new work. Returns a human-readable action log.

    * ``.<leaf>__optimize_old`` with NO live ``<leaf>``: the crash hit
      between the two swap renames — the moved-aside copy is the only
      copy. Renamed back verbatim (lossless restore).
    * ``.<leaf>__optimize_old`` WITH a live ``<leaf>``: either the swap
      completed and only the cleanup delete was lost (old == live
      content), or the live dir was recreated by later appends (old holds
      rows live does not). Indistinguishable on a plain filesystem —
      raises for operator reconciliation; nothing is deleted. Empty
      residue dirs are removed.
    * ``.<leaf>__optimize_tmp``: a disposable half-written rewrite —
      deleted (processed after the restores above, so a mid-swap crash
      restores first).
    """
    jvm, root, fs = _fs_for(spark, dest)
    if not fs.exists(root):
        return []
    olds, tmps = [], []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not st.isDirectory():
            continue
        # dot-prefixed = current naming; bare-suffix = residue from the
        # pre-dot-prefix version of this op — Spark partition discovery
        # PARSES those as bogus partition values, so they must be swept
        # here too, with the same restore-or-raise policy
        if name.endswith(OPT_OLD_SUFFIX):
            olds.append(st.getPath())
        elif name.endswith(OPT_TMP_SUFFIX):
            tmps.append(st.getPath())
    actions: list[str] = []
    for op in olds:
        leaf = op.getName()[: -len(OPT_OLD_SUFFIX)].removeprefix(".")
        live = jvm.org.apache.hadoop.fs.Path(root, leaf)
        n_files = int(fs.getContentSummary(op).getFileCount())
        if n_files == 0:
            fs.delete(op, True)
            actions.append(f"deleted empty residue {op.getName()}")
        elif not fs.exists(live):
            if not fs.rename(op, live):
                raise IOError(f"optimize recovery: could not restore {leaf}")
            actions.append(f"restored {leaf} from mid-swap crash residue")
        else:
            raise IOError(
                f"optimize recovery: both {leaf} and non-empty "
                f"{op.getName()} exist — ambiguous crash state (the live "
                "dir may hold rows written after the crash); reconcile "
                "manually, nothing was deleted"
            )
    for tp in tmps:
        fs.delete(tp, True)
        actions.append(f"deleted half-written rewrite {tp.getName()}")
    return actions


def _rewrite_partition(
    spark: SparkSession,
    p: PartitionStats,
    target_file_mb: int,
    collapse: tuple[str, str] | None,
) -> str:
    """Pack one partition: write the rewrite to a dot-prefixed sibling,
    then swap with two checked renames. Runs on a worker thread under the
    'optimize' scheduler pool."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "optimize")
    jvm, live, fs = _fs_for(spark, p.path)
    want = max(1, math.ceil(p.total_bytes / (target_file_mb * 1024 * 1024)))
    parent, leaf = live.getParent(), live.getName()
    tmp = jvm.org.apache.hadoop.fs.Path(parent, f".{leaf}{OPT_TMP_SUFFIX}")
    old = jvm.org.apache.hadoop.fs.Path(parent, f".{leaf}{OPT_OLD_SUFFIX}")
    if p.nested:
        if collapse is None:
            raise ValueError(
                f"partition {p.value} has sub-partition directories; pass "
                "collapse=(col, value) to fold them while packing"
            )
        col, val = collapse
        df = spark.read.option("basePath", p.path).parquet(p.path).drop(col)
        target = f"{tmp}/{col}={val}"
    else:
        df = spark.read.parquet(p.path)
        target = str(tmp)
    # coalesce, not repartition: packing files needs no shuffle, only
    # fewer output tasks over the partition's existing splits
    df.coalesce(want).write.mode("overwrite").parquet(target)
    # strip job markers so the packed partition's file count equals the
    # target and the next sweep's selection sees it as already optimal
    for m in _JOB_MARKERS:
        mp = jvm.org.apache.hadoop.fs.Path(target, m)
        if fs.exists(mp):
            fs.delete(mp, False)
    # Hadoop rename() reports failure by RETURN VALUE, not exception.
    if not fs.rename(live, old):
        raise IOError(f"optimize: could not move {p.path} aside")
    if not fs.rename(tmp, live):
        if not fs.rename(old, live):  # roll the live partition back
            raise IOError(
                f"optimize: swap AND rollback failed for {p.path}; "
                f"data is intact under {old}"
            )
        raise IOError(f"optimize: could not swap in rewrite for {p.path}")
    fs.delete(old, True)
    return p.value


def optimize_partitions(
    spark: SparkSession,
    dest: str,
    partition_col: str | None,
    target_file_mb: int = 128,
    min_files: int = 2,
    collapse: tuple[str, str] | None = None,
    max_concurrency: int = 8,
) -> list[str]:
    """Bin-pack every small-file partition of ``dest``; returns the
    partition values rewritten (sorted). Content-preserving (tests assert
    the table reads back identically); per-partition swap-by-rename with
    crash-residue recovery up front; independent partitions rewrite
    concurrently from a thread pool."""
    recover_optimize_residue(spark, dest)
    picked = select_partitions_to_optimize(
        partition_file_stats(spark, dest, partition_col), target_file_mb, min_files
    )
    if not picked:
        return []
    with ThreadPoolExecutor(max_workers=min(max_concurrency, len(picked))) as ex:
        futures = {
            ex.submit(_rewrite_partition, spark, p, target_file_mb, collapse): p
            for p in picked
        }
        done: list[str] = []
        failed: list[tuple[str, Exception]] = []
        for f in futures:  # collect ALL outcomes — no early-propagate that
            try:  # would discard already-completed partitions
                done.append(f.result())
            except Exception as exc:  # noqa: BLE001 — aggregated below
                failed.append((futures[f].value, exc))
        if failed:
            parts = ", ".join(v for v, _ in failed)
            raise OptimizePartialFailure(
                f"optimize: {len(failed)}/{len(picked)} partition rewrites "
                f"failed ({parts}); {len(done)} completed — see .completed; "
                f"first cause: {failed[0][1]!r}",
                completed=sorted(done),
                failed=failed,
            )
        return sorted(done)
