"""DataFrame-writer + native streaming sink for snapshot tables
(``sources/snapshot_sink.py``): the WRITE halves of the ``snapshot_table``
Python DataSource. Covers batch append/overwrite roundtrips, partitioned
layout + pruning parity with engine-written tables, per-task stats,
schema evolution, idempotence (txn options and the streaming batch
ledger), refusals, flat:// object-store roots, interop with the engine's
own verbs, and abort/residue behavior.
"""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.snapshots import (
    current_version,
    read_manifest,
    snapshot_optimize,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
    register_snapshot_stream_source,
)


@pytest.fixture(autouse=True)
def _register(spark):
    register_snapshot_stream_source(spark)


def _write(df, root, mode="append", **options):
    w = df.write.format("snapshot_table").option("root", root).mode(mode)
    for k, v in options.items():
        w = w.option(k, v)
    w.save()


def _sorted_rows(df, *keys):
    return df.orderBy(*keys).collect()


# ---------------------------------------------------------------------------
# batch writer
# ---------------------------------------------------------------------------


def test_batch_append_roundtrip_values(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 400).selectExpr(
        "id",
        "id % 7 as k",
        "concat('n', id % 11) as name",
        "timestamp_millis(1700000000000 + id * 1000) as ts",
        "to_date(timestamp_millis(1700000000000 + id * 86400000)) as d",
        "array(id, id + 1) as arr",
    )
    _write(df.repartition(3), root)
    got = snapshot_read(spark, root)
    assert _sorted_rows(got, "id") == _sorted_rows(df, "id")
    m = read_manifest(spark, root, 1)
    # every committed file carries its byte size (the metadata invariant
    # auto-compaction/OPTIMIZE triggers rest on)
    assert set(m["sizes"]) == set(m["files"]) and all(
        s > 0 for s in m["sizes"].values()
    )
    assert m["action"] == "append"
    assert m.get("committed_at") is not None


def test_batch_two_appends_accumulate(spark, tmp_path):
    root = str(tmp_path / "t")
    a = spark.range(0, 100).selectExpr("id", "id * 2 as v")
    b = spark.range(100, 150).selectExpr("id", "id * 2 as v")
    _write(a, root)
    _write(b, root)
    assert current_version(spark, root) == 2
    got = snapshot_read(spark, root)
    assert got.count() == 150
    assert snapshot_read(spark, root, 1).count() == 100  # time travel


def test_batch_overwrite_resets_files_keeps_history(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(0, 100).selectExpr("id", "id as v"), root)
    _write(spark.range(0, 30).selectExpr("id", "id * 9 as v"), root, "overwrite")
    assert snapshot_read(spark, root).count() == 30
    assert snapshot_read(spark, root, 1).count() == 100
    assert read_manifest(spark, root, 2)["action"] == "overwrite"


def test_partitioned_write_records_tuples_and_prunes(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 300).selectExpr(
        "id", "case when id % 3 = 0 then 'a' when id % 3 = 1 then 'b' end as g"
    )
    _write(df, root, partitionBy="g")
    m = read_manifest(spark, root, 1)
    assert m["partition_by"] == ["g"]
    assert set(m["partitions"]) == set(m["files"])
    got = snapshot_read(spark, root, filters=[("g", "=", "a")])
    opened = got.inputFiles()
    assert opened and all("__pv_g=a" in p for p in opened)
    assert got.count() == 100
    # NULL g rows live under the hive null dir and read back as NULL
    assert snapshot_read(spark, root).where("g is null").count() == 100


def test_partitioned_append_inherits_scheme(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 60).selectExpr("id", "cast(id % 2 as int) as b")
    _write(df, root, partitionBy="b")
    # second append WITHOUT the option inherits the table property
    _write(spark.range(60, 90).selectExpr("id", "cast(id % 2 as int) as b"), root)
    m = read_manifest(spark, root, 2)
    assert m["partition_by"] == ["b"]
    assert set(m["partitions"]) == set(m["files"])
    got = snapshot_read(spark, root, filters=[("b", "=", 1)])
    assert all("__pv_b=1" in p for p in got.inputFiles())
    assert got.count() == 45


def test_partitioned_append_scheme_conflict_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id", "cast(id % 2 as int) as b")
    _write(df, root, partitionBy="b")
    with pytest.raises(Exception, match="partition"):
        _write(df, root, partitionBy="id")


def test_partition_type_refused_for_lossy_types(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id", "cast(id as double) as x")
    with pytest.raises(Exception, match="round-trip"):
        _write(df, root, partitionBy="x")


def test_stats_recorded_and_prune(spark, tmp_path):
    root = str(tmp_path / "t")
    # two appends with disjoint id ranges => per-file stats must let a
    # point filter prune the other append's files entirely
    _write(spark.range(0, 100).selectExpr("id").coalesce(1), root, stats="id")
    _write(spark.range(1000, 1100).selectExpr("id").coalesce(1), root)
    m = read_manifest(spark, root, 2)
    assert m["stats_cols"] == ["id"]
    assert set(m["stats"]) == set(m["files"])
    got = snapshot_read(spark, root, filters=[("id", "=", 1050)])
    assert got.count() == 1
    assert len(got.inputFiles()) == 1  # the v1 file pruned by stats


def test_stats_match_engine_encoding_for_timestamps(spark, tmp_path):
    """Sink-gathered timestamp stats must be comparable with
    engine-gathered ones: naive-UTC ISO strings, same as
    ``_collect_file_stats`` records under the UTC session."""
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr(
        "id", "timestamp_millis(1700000000000 + id * 1000) as ts"
    )
    _write(df.coalesce(1), root, stats="ts")
    sink_stats = next(iter(read_manifest(spark, root, 1)["stats"].values()))
    root2 = str(tmp_path / "t2")
    snapshot_write(df.coalesce(1), root2, stats_cols=["ts"])
    engine_stats = next(iter(read_manifest(spark, root2, 1)["stats"].values()))
    assert sink_stats["ts"] == engine_stats["ts"]


def test_schema_evolution_append_adds_nullable_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(0, 20).selectExpr("id", "id as v"), root)
    _write(
        spark.range(20, 30).selectExpr("id", "id as v", "'x' as extra"), root
    )
    got = snapshot_read(spark, root)
    assert got.columns == ["id", "v", "extra"]
    assert got.where("extra is null").count() == 20


def test_schema_type_change_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(spark.range(0, 20).selectExpr("id", "id as v"), root)
    with pytest.raises(Exception, match="schema evolution"):
        _write(spark.range(0, 5).selectExpr("id", "'s' as v"), root)


def test_txn_options_make_batch_writes_idempotent(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 50).selectExpr("id")
    _write(df, root, txnAppId="daily", txnVersion="7")
    _write(df, root, txnAppId="daily", txnVersion="7")  # retried job
    assert current_version(spark, root) == 1
    assert snapshot_read(spark, root).count() == 50
    # a HIGHER version commits; the ledger advances
    _write(df, root, txnAppId="daily", txnVersion="8")
    assert current_version(spark, root) == 2
    assert read_manifest(spark, root, 2)["txns"] == {"daily": 8}
    # replay of the duplicate leaves no stray data objects behind
    data_dirs = set(os.listdir(os.path.join(root, "data")))
    live = {e.split("/", 2)[1] for e in read_manifest(spark, root, 2)["files"]}
    assert data_dirs == live


def test_txn_option_requires_both(spark, tmp_path):
    df = spark.range(0, 5).selectExpr("id")
    with pytest.raises(Exception, match="txnAppId and txnVersion"):
        _write(df, str(tmp_path / "t"), txnAppId="daily")


def test_max_records_per_file_caps_file_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _write(
        spark.range(0, 1000).selectExpr("id").coalesce(1),
        root,
        maxRecordsPerFile="100",
    )
    m = read_manifest(spark, root, 1)
    assert len(m["files"]) >= 10
    assert snapshot_read(spark, root).count() == 1000


def test_interop_engine_reads_and_mutates_sink_written_table(spark, tmp_path):
    """A sink-written table is a first-class engine table: OPTIMIZE
    rewrites it and snapshot_write appends to it, values intact."""
    root = str(tmp_path / "t")
    df = spark.range(0, 200).selectExpr("id", "id % 5 as k")
    _write(df.repartition(4), root)
    snapshot_write(spark.range(200, 250).selectExpr("id", "id % 5 as k"), root)
    assert snapshot_read(spark, root).count() == 250
    before = len(read_manifest(spark, root, None or current_version(spark, root))["files"])
    snapshot_optimize(spark, root, target_file_mb=64)
    after_m = read_manifest(spark, root, current_version(spark, root))
    assert len(after_m["files"]) <= before
    assert snapshot_read(spark, root).count() == 250


def test_sink_appends_to_engine_written_table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "cast(id % 3 as int) as b")
    snapshot_write(df, root, partition_by=["b"], stats_cols=["id"])
    _write(spark.range(100, 160).selectExpr("id", "cast(id % 3 as int) as b"), root)
    m = read_manifest(spark, root, 2)
    # inherited table properties: partition scheme AND stats columns
    assert m["partition_by"] == ["b"]
    assert m["stats_cols"] == ["id"]
    assert set(m["partitions"]) == set(m["files"])
    assert set(m["stats"]) == set(m["files"])
    assert snapshot_read(spark, root).count() == 160


def test_flat_root_full_lifecycle(spark, tmp_path):
    """The sink's write path against object-store semantics (flat://):
    publish via whole-object puts, commit via conditional put, read
    back through both the engine and the DataSource reader."""
    root = "flat://" + str(tmp_path / "obj")
    df = spark.range(0, 120).selectExpr("id", "id * 2 as v")
    _write(df.repartition(2), root)
    _write(spark.range(120, 140).selectExpr("id", "id * 2 as v"), root)
    assert snapshot_read(spark, root).count() == 140
    ds = spark.read.format("snapshot_table").option("root", root).load()
    assert ds.count() == 140
    assert snapshot_read(spark, root, 1).count() == 120


# ---------------------------------------------------------------------------
# refusals
# ---------------------------------------------------------------------------


def test_constraint_table_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id", "id as v")
    snapshot_write(df, root, constraints={"pos": "v >= 0"})
    with pytest.raises(Exception, match="CHECK constraints"):
        _write(df, root)


def test_bloom_table_refused(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id", "id as v")
    snapshot_write(df, root, bloom_cols=["id"])
    with pytest.raises(Exception, match="bloom"):
        _write(df, root)


def test_mem_root_refused(spark):
    df = spark.range(0, 5).selectExpr("id")
    with pytest.raises(Exception, match="put-if-absent"):
        _write(df, "mem://sink-refusal")


def test_missing_root_refused(spark):
    df = spark.range(0, 5).selectExpr("id")
    with pytest.raises(Exception, match="root"):
        df.write.format("snapshot_table").mode("append").save()


# ---------------------------------------------------------------------------
# streaming sink
# ---------------------------------------------------------------------------


def _stream_app(ckpt: str) -> str:
    """The sink's checkpoint-derived replay identity (normalized path)."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        stream_app_for_checkpoint,
    )

    return stream_app_for_checkpoint(ckpt)


def _drain(spark, src_glob, root, ckpt):
    q = (
        spark.readStream.schema("id long, v long")
        .json(src_glob)
        .writeStream.format("snapshot_table")
        .option("root", root)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_sink_drains_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spark.range(0, 50).selectExpr("id", "id * 2 as v").write.json(src + "/b0")
    _drain(spark, src + "/*", root, ckpt)
    m = read_manifest(spark, root, current_version(spark, root))
    assert m["action"] == "stream-append"
    # scalar HWM ledger keyed on the checkpoint-derived stream identity
    # (r9 VERDICT: no cumulative batch_ids list riding every manifest)
    assert m["stream_txns"] == {_stream_app(ckpt): 0}
    assert "batch_ids" not in m
    assert snapshot_read(spark, root).count() == 50
    # resume from the same checkpoint: only NEW input commits
    spark.range(50, 80).selectExpr("id", "id * 2 as v").write.json(src + "/b1")
    _drain(spark, src + "/*", root, ckpt)
    assert snapshot_read(spark, root).count() == 80
    m2 = read_manifest(spark, root, current_version(spark, root))
    assert m2["stream_txns"] == {_stream_app(ckpt): 1}
    assert "batch_ids" not in m2


def test_stream_sink_explicit_app_id_and_two_streams(spark, tmp_path):
    """An explicit streamAppId option overrides the checkpoint-derived
    identity, and two streams (distinct checkpoints) draining one table
    keep independent scalar HWMs — neither shadows the other's replays."""
    src1, src2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    root = str(tmp_path / "t")
    spark.range(0, 20).selectExpr("id", "id * 2 as v").write.json(src1 + "/b0")
    spark.range(100, 130).selectExpr("id", "id * 2 as v").write.json(src2 + "/b0")
    q = (
        spark.readStream.schema("id long, v long")
        .json(src1 + "/*")
        .writeStream.format("snapshot_table")
        .option("root", root)
        .option("streamAppId", "ingest-left")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    _drain(spark, src2 + "/*", root, str(tmp_path / "ck2"))
    m = read_manifest(spark, root, current_version(spark, root))
    ck2_app = _stream_app(str(tmp_path / "ck2"))
    assert m["stream_txns"] == {"ingest-left": 0, ck2_app: 0}
    assert "batch_ids" not in m
    assert snapshot_read(spark, root).count() == 50


def test_stream_sink_replayed_batch_commits_once(spark, tmp_path):
    """The exactly-once contract at the sink API level: commit() called
    twice with the same batchId (the engine's crash-replay delivery)
    appends once; the replay's freshly published files are deleted as
    residue, not committed."""
    from pyspark.sql.types import StructType

    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
        _write_task,
    )

    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    df = spark.range(0, 40).selectExpr("id", "id * 3 as v")
    schema = df.schema
    writer = SnapshotTableStreamWriter(
        schema, {"root": root}, overwrite=False
    )

    def deliver():
        # stand in for one executor task: the df's rows as Arrow batches
        import pyarrow as pa

        tbl = pa.Table.from_pandas(df.toPandas(), preserve_index=False)
        return _write_task(writer._cfg, tbl.to_batches(max_chunksize=16))

    writer.commit([deliver()], batchId=0)
    assert snapshot_read(spark, root).count() == 40
    writer.commit([deliver()], batchId=0)  # crash-replay delivery
    assert current_version(spark, root) == 1  # no second version
    assert snapshot_read(spark, root).count() == 40
    # the replay's residue objects were deleted
    live = {e.split("/", 1)[1] for e in read_manifest(spark, root, 1)["files"]}
    on_disk = set()
    for dirpath, _dirs, names in os.walk(os.path.join(root, "data")):
        for n in names:
            on_disk.add(
                os.path.relpath(os.path.join(dirpath, n), os.path.join(root, "data"))
            )
    assert on_disk == live


def test_stream_sink_refuses_complete_mode(spark, tmp_path):
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
    )

    df = spark.range(0, 5).selectExpr("id")
    with pytest.raises(Exception, match="append output mode"):
        SnapshotTableStreamWriter(
            df.schema, {"root": str(tmp_path / "t")}, overwrite=True
        )


def test_stream_sink_feeds_snapshot_stream_source(spark, tmp_path):
    """Sink and source compose: a table written by the native sink is
    immediately drainable by the snapshot_table STREAM SOURCE with
    version offsets — the full streaming loop without foreachBatch."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    spark.range(0, 30).selectExpr("id", "id * 2 as v").write.json(src + "/b0")
    _drain(spark, src + "/*", root, str(tmp_path / "ck1"))
    out = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .load()
        .writeStream.format("memory")
        .queryName("sink_loop")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(180)
    assert spark.table("sink_loop").count() == 30


# ---------------------------------------------------------------------------
# abort / crash residue
# ---------------------------------------------------------------------------


def test_failed_write_leaves_no_manifest(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr(
        "id", "assert_true(id < 50, 'boom') as chk"
    )
    with pytest.raises(Exception):
        _write(df, root)
    assert current_version(spark, root) is None
    # and a later clean write starts at version 1, unaffected by residue
    _write(spark.range(0, 10).selectExpr("id", "cast(null as void) as chk"), root)
    assert current_version(spark, root) == 1


def test_concurrent_version_claim_rebases(spark, tmp_path):
    """A version claimed between planning and commit is not clobbered:
    the sink's CAS loop rebases onto the fresh tip and commits the next
    version — both commits' rows survive."""
    root = str(tmp_path / "t")
    snapshot_write(spark.range(0, 10).selectExpr("id"), root)
    # plan a writer against v1, then land a concurrent engine commit
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableWriter,
        _write_task,
    )

    df = spark.range(100, 120).selectExpr("id")
    writer = SnapshotTableWriter(df.schema, {"root": root}, overwrite=False)
    import pyarrow as pa

    msg = _write_task(
        writer._cfg,
        pa.Table.from_pandas(df.toPandas(), preserve_index=False).to_batches(),
    )
    snapshot_write(spark.range(10, 20).selectExpr("id"), root)  # races in
    writer.commit([msg])
    assert current_version(spark, root) == 3
    assert snapshot_read(spark, root).count() == 40

# ---------------------------------------------------------------------------
# legacy batch_ids ledger: the pre-r10 sink upgrade path (r10 ADVICE)
# ---------------------------------------------------------------------------


def _deliver(spark, writer, lo, hi, batch_id):
    """Stand in for one executor task + the engine's commit call."""
    import pyarrow as pa

    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        _write_task,
    )

    df = spark.range(lo, hi).selectExpr("id", "id * 3 as v")
    msg = _write_task(
        writer._cfg,
        pa.Table.from_pandas(df.toPandas(), preserve_index=False).to_batches(),
    )
    writer.commit([msg], batchId=batch_id)


def _legacyize(root):
    """Rewrite the tip manifest into the PRE-r10 sink's ledger shape: a
    cumulative ``batch_ids`` list, no ``stream_txns``, no
    ``stream-txn-ledger`` writer feature — the on-disk state an old-sink
    table carries when this build first opens it."""
    import glob
    import json as _json

    from aws_logs_parquet_converter_spark import storage as st

    tip = sorted(glob.glob(os.path.join(root, "_snapshots", "v*.json")))[-1]
    with open(tip, "rb") as fh:
        raw = st.decode_manifest_bytes(fh.read())
    hwm = max(raw.pop("stream_txns").values())
    raw["batch_ids"] = list(range(hwm + 1))
    wf = [f for f in raw.get("writer_features", []) if f != "stream-txn-ledger"]
    if wf:
        raw["writer_features"] = wf
    else:
        raw.pop("writer_features", None)
    with open(tip, "wb") as fh:
        fh.write(_json.dumps(raw, sort_keys=True).encode())


def test_stream_sink_legacy_ledger_upgrade_replay_skipped(spark, tmp_path):
    """A pre-r10 sink table (cumulative batch_ids list, one implicit
    stream) resumed on the SAME checkpoint under this build: the derived
    app id has no scalar ledger entry, but the legacy list is ADOPTED as
    this stream's history — the engine's re-delivered last batch is
    skipped, not committed twice (r10 ADVICE medium), and the fold lands
    on the stream's own key so the adoption survives later restarts."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
    )
    from pyspark.sql.types import StructType

    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(root, exist_ok=True)
    schema = spark.range(0, 1).selectExpr("id", "id * 3 as v").schema
    opts = {"root": root, "checkpointlocation": ckpt}
    w0 = SnapshotTableStreamWriter(schema, opts, overwrite=False)
    for b in range(3):
        _deliver(spark, w0, b * 10, b * 10 + 10, b)
    _legacyize(root)  # now the table looks written by the PRE-r10 sink
    m = read_manifest(spark, root, 3)
    assert m["batch_ids"] == [0, 1, 2] and "stream_txns" not in m

    # resume on the same checkpoint: batch 2 is RE-DELIVERED
    w1 = SnapshotTableStreamWriter(schema, opts, overwrite=False)
    _deliver(spark, w1, 20, 30, 2)
    assert current_version(spark, root) == 3  # skipped, no 4th version
    assert snapshot_read(spark, root).count() == 30
    # the next NEW batch commits and folds the list onto THIS stream's key
    _deliver(spark, w1, 30, 40, 3)
    m4 = read_manifest(spark, root, 4)
    app = _stream_app(ckpt)
    assert m4["stream_txns"] == {app: 3}
    assert "batch_ids" not in m4
    assert snapshot_read(spark, root).count() == 40
    # restart AFTER the fold: the adopted identity is sticky
    w2 = SnapshotTableStreamWriter(schema, opts, overwrite=False)
    _deliver(spark, w2, 30, 40, 3)  # re-delivered
    assert current_version(spark, root) == 4
    assert snapshot_read(spark, root).count() == 40


def test_stream_sink_new_stream_not_vetoed_by_legacy_list(spark, tmp_path):
    """A genuinely NEW stream (fresh checkpoint, batches from 0) draining
    a legacy-ledgered table must NOT adopt the old stream's list — its
    batch 0 sits below the legacy high-water mark, so adoption declines
    and the rows commit (the r10 self-review finding #2 guarantee,
    preserved under the upgrade-path fix)."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
    )

    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    schema = spark.range(0, 1).selectExpr("id", "id * 3 as v").schema
    old = SnapshotTableStreamWriter(
        schema,
        {"root": root, "checkpointlocation": str(tmp_path / "old-ck")},
        overwrite=False,
    )
    for b in range(3):
        _deliver(spark, old, b * 10, b * 10 + 10, b)
    _legacyize(root)
    fresh = SnapshotTableStreamWriter(
        schema,
        {"root": root, "checkpointlocation": str(tmp_path / "new-ck")},
        overwrite=False,
    )
    _deliver(spark, fresh, 100, 110, 0)  # batch 0 of the NEW stream
    assert current_version(spark, root) == 4
    assert snapshot_read(spark, root).count() == 40
    m = read_manifest(spark, root, 4)
    assert m["stream_txns"][_stream_app(str(tmp_path / "new-ck"))] == 0


def test_stream_app_normalizes_checkpoint_respellings(tmp_path):
    """Every spelling Spark treats as the same checkpoint hashes to the
    same replay identity (r10 ADVICE: relative paths, file URI
    authority, duplicated slashes all minted fresh identities)."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        stream_app_for_checkpoint as app,
    )

    base = app("/tmp/ck/q1")
    assert app("/tmp/ck/q1/") == base
    assert app("/tmp//ck//q1") == base
    assert app("/tmp/ck/./q1") == base
    assert app("/tmp/ck/other/../q1") == base
    assert app("file:///tmp/ck/q1") == base
    assert app("file://localhost/tmp/ck/q1") == base
    assert app("file:/tmp/ck/q1") == base
    # relative spellings hash verbatim-normalized, NOT cwd-resolved
    # (r12, advisor): a cwd-dependent identity differs run-to-run, so
    # the same relative spelling must hash identically from any cwd
    cwd = os.getcwd()
    try:
        os.makedirs("/tmp/ck", exist_ok=True)
        os.chdir("/tmp/ck")
        rel = app("q1")
        assert app("./q1/") == rel
        os.chdir("/tmp")
        assert app("q1") == rel  # stable across cwd changes
        assert rel != base  # relative and absolute forms stay distinct
    finally:
        os.chdir(cwd)
    # distinct locations stay distinct
    assert app("/tmp/ck/q2") != base
    # remote URIs: path collapsed, authority preserved
    assert app("hdfs://nn:8020//ck//q1/") == app("hdfs://nn:8020/ck/q1")
    assert app("hdfs://nn:8020/ck/q1") != app("hdfs://other:8020/ck/q1")


def test_stream_sink_r10_alias_ledger_adopted_on_upgrade(spark, tmp_path):
    """A table whose ``stream_txns`` ledger was keyed by an EARLIER
    build's normalization of the same checkpoint spelling (r10 hashed
    ``file://localhost/x`` as ``localhost/x``): on a ledger miss for
    the current derived id, the alias hash is probed — the engine's
    re-delivered last batch is skipped, and the next batch folds the
    alias HWM onto the current key (r12 advisor medium)."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
        _stream_app_legacy_aliases,
    )

    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    ckpt = "file://localhost" + str(tmp_path / "ck")
    aliases = _stream_app_legacy_aliases(ckpt)
    assert aliases, "file://localhost spelling must have an r10 alias"
    schema = spark.range(0, 1).selectExpr("id", "id * 3 as v").schema
    # the r10-era build keyed the ledger under its own hash: emulate by
    # writing batches 0-2 with that id passed explicitly
    old = SnapshotTableStreamWriter(
        schema,
        {"root": root, "checkpointlocation": ckpt, "streamappid": aliases[-1]},
        overwrite=False,
    )
    for b in range(3):
        _deliver(spark, old, b * 10, b * 10 + 10, b)
    m = read_manifest(spark, root, 3)
    assert m["stream_txns"] == {aliases[-1]: 2}

    # upgrade: the resumed stream derives the CURRENT id from the same
    # spelling; Spark re-delivers the last batch
    new = SnapshotTableStreamWriter(
        schema, {"root": root, "checkpointlocation": ckpt}, overwrite=False
    )
    _deliver(spark, new, 20, 30, 2)  # re-delivered: must be skipped
    assert current_version(spark, root) == 3
    assert snapshot_read(spark, root).count() == 30
    _deliver(spark, new, 30, 40, 3)  # next batch: commits + folds
    m4 = read_manifest(spark, root, 4)
    assert m4["stream_txns"][_stream_app(ckpt)] == 3
    assert snapshot_read(spark, root).count() == 40
    # restart after the fold: the current key holds the HWM
    again = SnapshotTableStreamWriter(
        schema, {"root": root, "checkpointlocation": ckpt}, overwrite=False
    )
    _deliver(spark, again, 30, 40, 3)  # re-delivered
    assert current_version(spark, root) == 4


def test_stream_sink_single_batch_legacy_declines_adoption(spark, tmp_path):
    """batch_ids == [0] is AMBIGUOUS: a resumed legacy stream replaying
    batch 0 and a genuinely new stream delivering its batch 0 look the
    same. The sink declines adoption — the chosen failure mode is a
    possible duplicate of that one batch, never dropping a new stream's
    first batch (r12 advisor low; streamAppId=_stream opts into the
    replay-veto instead)."""
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
    )

    root = str(tmp_path / "t")
    os.makedirs(root, exist_ok=True)
    schema = spark.range(0, 1).selectExpr("id", "id * 3 as v").schema
    old = SnapshotTableStreamWriter(
        schema,
        {"root": root, "checkpointlocation": str(tmp_path / "old-ck")},
        overwrite=False,
    )
    _deliver(spark, old, 0, 10, 0)  # exactly ONE legacy batch
    _legacyize(root)
    m = read_manifest(spark, root, 1)
    assert m["batch_ids"] == [0]

    # a NEW stream's batch 0 must COMMIT, not be vetoed + residue-deleted
    fresh = SnapshotTableStreamWriter(
        schema,
        {"root": root, "checkpointlocation": str(tmp_path / "new-ck")},
        overwrite=False,
    )
    _deliver(spark, fresh, 100, 110, 0)
    assert current_version(spark, root) == 2
    assert snapshot_read(spark, root).count() == 20
    # the explicit opt-in resolves the ambiguity the other way
    opted = SnapshotTableStreamWriter(
        schema,
        {
            "root": root,
            "checkpointlocation": str(tmp_path / "old-ck"),
            "streamappid": "_stream",
        },
        overwrite=False,
    )
    _deliver(spark, opted, 0, 10, 0)  # replay of the legacy batch
    assert current_version(spark, root) == 2  # vetoed by the legacy list
