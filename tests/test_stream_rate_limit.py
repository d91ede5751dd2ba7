"""Rate-limited admission on the snapshot streaming source —
maxFilesPerTrigger / maxBytesPerTrigger (Delta's read limits).

The scale story under test: a stream catching up on a large backlog
must take it in bounded micro-batches whose size the operator chooses,
not one unbounded first batch; the bound must hold ACROSS RESTARTS
(each restart builds a fresh reader whose position is recovered from
the engine's replay of the offset log's last batch); and splitting
WITHIN a version (sub-version ``index`` offsets) must lose and
duplicate nothing.
"""

import json

import pytest
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.snapshots import (
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
    register_snapshot_stream_source,
)
from aws_logs_parquet_converter_spark.storage import storage_for_root


def _reader(root: str, **opts):
    """A driver-side stream reader over ``root`` — the unit under test,
    driven directly the way the engine drives it (initialOffset /
    latestOffset / partitions)."""
    from pyspark.sql.types import StructType

    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        _SnapshotStreamReader,
        _read_manifest_py,
    )
    from aws_logs_parquet_converter_spark.storage import current_version_fast

    storage = storage_for_root(root)
    tip = current_version_fast(storage, root)
    schema = StructType.fromJson(
        json.loads(_read_manifest_py(storage, root, tip)["schema"])
    )
    options = {"root": root}
    options.update({k.lower(): str(v) for k, v in opts.items()})
    if str(options.get("changefeed", "")).lower() in ("true", "1"):
        from pyspark.sql.types import LongType, StringType

        schema = schema.add("_change_type", StringType()).add(
            "_commit_version", LongType()
        )
    return _SnapshotStreamReader(schema, options)


def _drain_offsets(reader, max_polls: int = 50):
    """Drive the reader like MicroBatchExecution: poll latestOffset
    until it stops advancing, planning each batch. Returns the list of
    (start, end, partitions) triples."""
    batches = []
    cur = reader.initialOffset()
    for _ in range(max_polls):
        nxt = reader.latestOffset()
        if json.dumps(nxt, sort_keys=True) == json.dumps(cur, sort_keys=True):
            return batches
        parts = reader.partitions(cur, nxt)
        batches.append((cur, nxt, parts))
        reader.commit(nxt)
        cur = nxt
    raise AssertionError("offset never converged — runaway admission loop")


def _fragmented_table(spark, tmp_path, commits=3, files_per_commit=4):
    root = str(tmp_path / "tbl")
    n = 0
    for _ in range(commits):
        df = spark.range(n, n + 8).selectExpr("id", "id * 2 AS v")
        snapshot_write(df.repartition(files_per_commit), root)
        n += 8
    return root, n


def test_max_files_splits_within_and_across_versions(spark, tmp_path):
    """maxFilesPerTrigger=5 over 3 commits x 4 files: batches of 5/5/2,
    the middle offsets carrying sub-version indexes, no file lost or
    planned twice."""
    root, _ = _fragmented_table(spark, tmp_path)
    r = _reader(root, maxFilesPerTrigger=5)
    batches = _drain_offsets(r)
    sizes = [len(parts) for _, _, parts in batches]
    assert sizes == [5, 5, 2], sizes
    # the split offsets are sub-version (index present), the final one
    # normalized back to the plain version shape
    assert batches[0][1] == {"version": 2, "index": 1}
    assert batches[1][1] == {"version": 3, "index": 2}
    assert batches[2][1] == {"version": 3}
    entries = [p.entry for _, _, parts in batches for p in parts]
    assert len(entries) == len(set(entries)) == 12
    # exactly the table's live files
    m = storage_for_root(root)
    from aws_logs_parquet_converter_spark.storage import read_manifest

    assert sorted(entries) == sorted(read_manifest(m, root, 3)["files"])


def test_max_bytes_admits_at_least_one_file(spark, tmp_path):
    """maxBytesPerTrigger smaller than any single file still advances
    one file per batch (Delta's at-least-one rule — a stream never
    stalls on a file bigger than the limit)."""
    root, _ = _fragmented_table(spark, tmp_path, commits=1, files_per_commit=3)
    r = _reader(root, maxBytesPerTrigger=1)
    batches = _drain_offsets(r)
    assert [len(parts) for _, _, parts in batches] == [1, 1, 1]


def test_max_bytes_accounts_manifest_sizes(spark, tmp_path):
    """The byte limit reads the manifests' recorded per-file ``sizes``
    (pure metadata): a limit of ~1.5 files admits exactly 2 per batch
    (the crossing file is admitted, then the batch closes)."""
    from aws_logs_parquet_converter_spark.storage import read_manifest

    root, _ = _fragmented_table(spark, tmp_path, commits=1, files_per_commit=4)
    storage = storage_for_root(root)
    sizes = read_manifest(storage, root, 1)["sizes"]
    limit = int(1.5 * max(sizes.values()))
    r = _reader(root, maxBytesPerTrigger=limit)
    batches = _drain_offsets(r)
    assert [len(parts) for _, _, parts in batches] == [2, 2]


def test_byte_size_suffixes():
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        _parse_byte_size,
    )

    assert _parse_byte_size("1024") == 1024
    assert _parse_byte_size("2k") == 2048
    assert _parse_byte_size("1m") == 1024**2
    assert _parse_byte_size("3g") == 3 * 1024**3
    assert _parse_byte_size("1G") == 1024**3
    assert _parse_byte_size("128mb") == 128 * 1024**2


def test_invalid_limits_raise(spark, tmp_path):
    root, _ = _fragmented_table(spark, tmp_path, commits=1, files_per_commit=1)
    with pytest.raises(ValueError, match="maxFilesPerTrigger"):
        _reader(root, maxFilesPerTrigger=0)
    with pytest.raises(ValueError, match="maxBytesPerTrigger"):
        _reader(root, maxBytesPerTrigger=-5)


def test_legacy_offsets_without_index_still_plan(spark, tmp_path):
    """A checkpoint written by a pre-rate-limit run stores plain
    ``{"version": v}`` offsets — they must keep resolving (index absent
    = version wholly consumed), including mixed with indexed ends."""
    root, _ = _fragmented_table(spark, tmp_path)
    r = _reader(root)
    parts = r.partitions({"version": 1}, {"version": 2, "index": 1})
    assert len(parts) == 1  # first file of version 2 only
    parts = r.partitions({"version": 1}, {"version": 3})
    assert len(parts) == 8  # versions 2..3 in full
    assert r.partitions({"version": 2}, {"version": 2}) == []


def test_admission_skips_optimize_versions(spark, tmp_path):
    """An OPTIMIZE commit in the backlog contributes nothing and the
    admission walk advances past it instead of stalling."""
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_optimize,
    )

    root = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(0, 8).selectExpr("id", "id*2 AS v").repartition(4), root
    )
    snapshot_optimize(spark, root, full=True)
    snapshot_write(
        spark.range(8, 16).selectExpr("id", "id*2 AS v").repartition(2), root
    )
    r = _reader(root, maxFilesPerTrigger=3)
    batches = _drain_offsets(r)
    # v1: 4 files, v2: optimize (0), v3: 2 files -> 3 + (1 + 2)
    assert [len(parts) for _, _, parts in batches] == [3, 3]
    got = {p.entry for _, _, parts in batches for p in parts}
    assert len(got) == 6


def test_restart_recovery_keeps_batches_bounded(spark, tmp_path):
    """The e2e property: repeated Trigger.Once runs over one checkpoint
    (each run a FRESH reader — a restart) drain a 6-file backlog one
    file per run, and the union equals the batch read. If restart
    recovery failed, the first batch of run 2 would be unbounded."""
    root, n = _fragmented_table(spark, tmp_path, commits=3, files_per_commit=2)
    register_snapshot_stream_source(spark)
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    counts = []
    for _ in range(6):
        q = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("maxFilesPerTrigger", 1)
            .load()
            .writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
        counts.append(spark.read.parquet(dest).count())
    # strictly monotone by exactly one file's rows (4 rows/file)
    assert counts == [4, 8, 12, 16, 20, 24], counts
    got = spark.read.parquet(dest)
    want = snapshot_read(spark, root)
    assert got.count() == n
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_rate_limited_drain_with_processing_trigger(spark, tmp_path):
    """Steady-state backpressure: a processing-time trigger drains the
    whole backlog in limit-bounded batches within ONE run; progress
    telemetry proves no batch exceeded the limit."""
    import time

    root, n = _fragmented_table(spark, tmp_path, commits=2, files_per_commit=3)
    register_snapshot_stream_source(spark)
    dest = str(tmp_path / "dest")
    q = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("maxFilesPerTrigger", 2)
        .load()
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(dest).count() >= n:
                    break
            except Exception:
                pass  # sink not committed yet
            time.sleep(0.3)
    finally:
        q.stop()
    got = spark.read.parquet(dest)
    assert got.count() == n
    # 6 files at 2 per batch: every non-empty batch stayed within the
    # limit (<= 2 files = 8 rows plus zero-row planning batches)
    rows_per_batch = [
        p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0
    ]
    assert rows_per_batch and all(r <= 8 for r in rows_per_batch), (
        rows_per_batch
    )
    assert len(rows_per_batch) >= 3


def test_cdf_rate_limited_drain_matches_unlimited(spark, tmp_path):
    """Change-feed mode under maxFilesPerTrigger: the sliced spec
    stream (insert + delete images) drains to exactly the unlimited
    changefeed's rows — sub-version slicing of change SPECS loses and
    duplicates nothing."""
    root = str(tmp_path / "tbl")
    snapshot_write(
        spark.range(0, 12).selectExpr("id", "id*2 AS v").repartition(3), root
    )
    snapshot_delete(spark, root, [("id", ">=", 9)], mode="dv")
    snapshot_write(
        spark.range(12, 20).selectExpr("id", "id*2 AS v").repartition(2), root
    )
    register_snapshot_stream_source(spark)

    def drain(dest, ckpt, **opts):
        reader = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("changefeed", "true")
        )
        for k, v in opts.items():
            reader = reader.option(k, v)
        for _ in range(10):
            q = (
                reader.load()
                .writeStream.format("parquet")
                .option("path", dest)
                .option("checkpointLocation", ckpt)
                .trigger(once=True)
                .start()
            )
            q.awaitTermination()
        return spark.read.parquet(dest)

    unlimited = drain(str(tmp_path / "d0"), str(tmp_path / "c0"))
    limited = drain(
        str(tmp_path / "d1"), str(tmp_path / "c1"), maxFilesPerTrigger=1
    )
    assert limited.count() == unlimited.count()
    assert limited.exceptAll(unlimited).count() == 0
    assert unlimited.exceptAll(limited).count() == 0
    # both saw the delete images, not just appends
    assert (
        limited.filter(F.col("_change_type") == "delete").count()
        == 3
    )


def test_filters_compose_with_limits(spark, tmp_path):
    """The ``filters`` pushdown composes with rate limiting: admission
    counts RAW delta files (offset stability does not depend on the
    filter option — it may change across restarts), pruning happens at
    planning, and the drained rows equal the filtered batch read."""
    root, _ = _fragmented_table(spark, tmp_path, commits=2, files_per_commit=2)
    register_snapshot_stream_source(spark)
    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    for _ in range(4):
        q = (
            spark.readStream.format("snapshot_table")
            .option("root", root)
            .option("maxFilesPerTrigger", 1)
            .option("filters", json.dumps([["id", "<", 5]]))
            .load()
            .writeStream.format("parquet")
            .option("path", dest)
            .option("checkpointLocation", ckpt)
            .trigger(once=True)
            .start()
        )
        q.awaitTermination()
    got = spark.read.parquet(dest)
    want = snapshot_read(spark, root).filter("id < 5")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_mid_stream_widening_fails_with_restart_instruction(spark, tmp_path):
    """A widening commit landing WHILE a stream runs makes later files
    WIDER than the query's captured schema: the reader must fail naming
    the restart remedy, never silently narrow values (a restarted query
    re-resolves the wide schema and reads both widths fine)."""
    import time

    from aws_logs_parquet_converter_spark.plans.snapshots import snapshot_write

    root = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 4).selectExpr(
            "CAST(id AS INT) AS a", "CAST(id AS FLOAT) AS b"
        ),
        root,
    )
    register_snapshot_stream_source(spark)
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(dest).count() >= 4:
                    break
            except Exception:
                pass
            time.sleep(0.2)
        # WIDENING append lands mid-stream
        snapshot_write(
            spark.range(4, 8).selectExpr("id AS a", "CAST(id AS DOUBLE) AS b"),
            root,
        )
        with pytest.raises(Exception, match="widened or retyped"):
            q.awaitTermination(90)
            raise AssertionError("stream survived a mid-run widening")
    finally:
        try:
            q.stop()
        except Exception:
            pass
    # a RESTARTED query adopts the wide schema and drains the rest
    q2 = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .load()
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    # the sink now holds mixed-width parquet (run 1 wrote int32 a, the
    # restarted run writes int64): declare the wide schema to read both
    got = spark.read.schema("a long, b double").parquet(dest)
    assert got.count() == 8
    assert sorted(r.a for r in got.collect()) == list(range(8))


def test_drain_progress_accumulates_past_recent_buffer():
    """r13 (verdict r12 #3): the drain wait must ACCUMULATE progress per
    batchId, not re-sum ``recentProgress`` — that property is a bounded
    buffer (default 100 updates), so a catch-up drain of more batches
    than the buffer holds would undercount forever and burn the full
    deadline. Simulate a 250-micro-batch drain through a stub whose
    recentProgress window slides like the real one."""
    from aws_logs_parquet_converter_spark.streaming.events import (
        _drain_progress_rows,
    )

    class _SlidingStub:
        """Yields progress for batches 0..249, 10 rows each, exposing only
        the LAST 100 updates at any poll — the real buffer semantics."""

        def __init__(self, n_batches: int, window: int = 100):
            self._all = [
                {"batchId": i, "numInputRows": 10} for i in range(n_batches)
            ]
            self._window = window
            self._served = 0

        @property
        def recentProgress(self):
            # each poll reveals ~40 more committed batches (faster than the
            # 0.1 s poll tick could ever observe them individually)
            self._served = min(len(self._all), self._served + 40)
            lo = max(0, self._served - self._window)
            return self._all[lo : self._served]

    stub = _SlidingStub(250)
    done = _drain_progress_rows(stub, expected=2500, deadline_s=30)
    assert done == 2500  # every batch counted exactly once


def test_drain_progress_counts_each_batch_once():
    """Replayed/overlapping buffer views must not double-count a batch."""
    from aws_logs_parquet_converter_spark.streaming.events import (
        _drain_progress_rows,
    )

    class _RepeatStub:
        @property
        def recentProgress(self):
            return [{"batchId": 0, "numInputRows": 7}, {"batchId": 1, "numInputRows": 5}]

    assert _drain_progress_rows(_RepeatStub(), expected=12, deadline_s=10) == 12
