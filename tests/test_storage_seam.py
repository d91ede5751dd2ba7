"""The shared storage seam (storage.py): the three primitives every
snapshot-table reader needs — list versions, read manifest bytes, open
data file — contract-tested across implementations, plus the shared
manifest resolver both the JVM planner and the Python DataSource consume
(r6 verdict task 2: one parser, no drift between the two readers)."""

from __future__ import annotations

import pickle

import pytest

from aws_logs_parquet_converter_spark import storage as st
from aws_logs_parquet_converter_spark.plans.snapshots import (
    MANIFEST_CHECKPOINT_EVERY,
    read_manifest as jvm_read_manifest,
    snapshot_read,
    snapshot_write,
)


def _build_table(spark, root: str, commits: int) -> None:
    """Enough commits to cross a manifest checkpoint boundary, so the
    contract run exercises DELTA-encoded manifests (the chain walk)."""
    for i in range(commits):
        snapshot_write(
            spark.range(10 * i, 10 * (i + 1)).selectExpr("id", "id * 2 AS v"),
            root,
            stats_cols=["id"],
        )


class _DictStorage(st.SnapshotStorage):
    """Pure in-memory double: proves the seam readers touch NOTHING but
    the interface (no os/path assumptions hiding in the resolver)."""

    def __init__(self, local: st.LocalSnapshotStorage, root: str):
        self._manifests = {
            v: local.read_manifest_bytes(root, v)
            for v in local.list_versions(root)
        }

    def list_versions(self, root):
        return sorted(self._manifests)

    def read_manifest_bytes(self, root, version):
        if version not in self._manifests:
            raise FileNotFoundError(f"no version {version}")
        return self._manifests[version]


def _upload_to_memory(local_root: str, mem_root: str) -> st.MemorySnapshotStorage:
    """Mirror a local table tree into the in-memory object store —
    the offline stand-in for syncing a table to s3:// / memory://."""
    import os

    mem = st.MemorySnapshotStorage()
    for dirpath, _dirs, names in os.walk(local_root):
        for n in names:
            if n.endswith(".crc") or n.startswith(".tmp-"):
                continue
            p = os.path.join(dirpath, n)
            rel = os.path.relpath(p, local_root)
            with open(p, "rb") as fh:
                mem.put(f"{mem_root}/{rel}", fh.read())
    return mem


def _impls(root):
    """(name, impl, addressed-root) triples: every impl must serve the
    same table — local/fsspec over the on-disk tree, the memory
    object-store double over an uploaded URI namespace (the non-local
    path: URI joining, prefix listing, no rename, file-like opens)."""
    impls = [("local", st.LocalSnapshotStorage(), root)]
    try:
        import fsspec  # noqa: F401

        impls.append(("fsspec", st.FsspecSnapshotStorage("file"), root))
    except ImportError:
        pass
    mem_root = f"mem://contract/{abs(hash(root)) % 10**8}/t"
    impls.append(("memory", _upload_to_memory(root, mem_root), mem_root))
    return impls


def test_contract_versions_and_manifests_match_jvm_reader(spark, tmp_path):
    """Every impl lists the same versions and resolves byte-identical
    manifests to the JVM planner's reader — including delta-encoded
    versions, whose chain walk is the code that used to exist twice."""
    root = str(tmp_path / "t")
    n = MANIFEST_CHECKPOINT_EVERY + 3  # crosses a checkpoint: deltas exist
    _build_table(spark, root, n)
    expected = {v: jvm_read_manifest(spark, root, v) for v in range(1, n + 1)}
    for name, impl, r in _impls(root):
        assert impl.list_versions(r) == list(range(1, n + 1)), name
        for v, want in expected.items():
            assert st.read_manifest(impl, r, v) == want, (name, v)
        with pytest.raises(FileNotFoundError):
            impl.read_manifest_bytes(r, n + 99)


def test_contract_dict_double_resolves_delta_chains(spark, tmp_path):
    """The resolver consumes ONLY the interface: a dict-backed double
    with no filesystem at all resolves a delta-encoded version to the
    same manifest the JVM reader produces."""
    root = str(tmp_path / "t")
    n = MANIFEST_CHECKPOINT_EVERY + 2
    _build_table(spark, root, n)
    double = _DictStorage(st.LocalSnapshotStorage(), root)
    for v in (1, n // 2, n):
        assert st.read_manifest(double, root, v) == jvm_read_manifest(
            spark, root, v
        )


def test_contract_open_data_file_feeds_pyarrow(spark, tmp_path):
    """open_data_file returns something pyarrow accepts, and the rows
    round-trip: the executor-side read path of the DataSource."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _build_table(spark, root, 2)
    for name, impl, r in _impls(root):
        m = st.read_manifest(impl, r, 2)
        total = 0
        for entry in m["files"]:
            total += pq.ParquetFile(impl.open_data_file(r, entry)).metadata.num_rows
        assert total == 20, name


def test_contract_manifest_mtime_orders_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    _build_table(spark, root, 3)
    for name, impl, r in _impls(root):
        ts = [impl.manifest_mtime(r, v) for v in (1, 2, 3)]
        assert ts == sorted(ts), name
        # the commit clock every resolution site actually uses is the
        # in-commit stamp, identical across impls and strictly ordered
        cts = [st.manifest_commit_time(impl, r, v) for v in (1, 2, 3)]
        assert cts == sorted(cts) and len(set(cts)) == 3, name


def test_storage_impls_are_picklable(tmp_path):
    """The DataSource ships its storage to executors inside serialized
    partitions/readers — both shipped impls must round-trip pickle."""
    local = pickle.loads(pickle.dumps(st.LocalSnapshotStorage()))
    assert isinstance(local, st.LocalSnapshotStorage)
    fs = st.FsspecSnapshotStorage("s3", anon=True)
    fs2 = pickle.loads(pickle.dumps(fs))
    assert fs2._protocol == "s3" and fs2._options == {"anon": True}
    assert fs2._fs is None  # handle rebuilt lazily executor-side


def test_storage_for_root_dispatch():
    assert isinstance(st.storage_for_root("/x/y"), st.LocalSnapshotStorage)
    # r10: s3:// routes to the conditional-put store (WRITE-capable; the
    # LogStore primitive) instead of the read-only fsspec fallback
    assert isinstance(
        st.storage_for_root("s3://bucket/table"), st.S3ConditionalPutStorage
    )
    gs = st.storage_for_root("gs://bucket/table")
    assert isinstance(gs, st.FsspecSnapshotStorage)
    assert gs._protocol == "gs"
    assert isinstance(
        st.storage_for_root("mem://b/t"), st.MemorySnapshotStorage
    )
    # the deployment hook: custom schemes route to registered factories
    class _Probe(st.LocalSnapshotStorage):
        pass

    st.register_storage_scheme("probefs", _Probe)
    try:
        assert isinstance(st.storage_for_root("probefs://x/y"), _Probe)
    finally:
        st._SCHEME_FACTORIES.pop("probefs", None)


def test_version_at_or_before_bisects(spark, tmp_path):
    """Timestamp resolution bisects over monotonic in-commit stamps:
    correct at-or-before / strictly-before semantics at the boundaries,
    and O(log n) manifest reads (counted), not one per version."""
    root = str(tmp_path / "t")
    _build_table(spark, root, 5)
    impl = st.LocalSnapshotStorage()
    times = [st.manifest_commit_time(impl, root, v) for v in range(1, 6)]
    assert st.version_at_or_before(impl, root, times[2]) == 3
    assert st.version_at_or_before(impl, root, times[2], strict=True) == 2
    assert st.version_at_or_before(impl, root, times[0] - 1) is None
    assert st.version_at_or_before(impl, root, times[-1] + 1) == 5

    class _Counting(st.LocalSnapshotStorage):
        reads = 0

        def read_manifest_bytes(self, r, v):
            _Counting.reads += 1
            return super().read_manifest_bytes(r, v)

    # O(log n) read count, asserted over a history long enough to bite:
    # 64 synthetic stamped manifests, resolution must stay within the
    # stamp-boundary probe (~log n) + the suffix bisect (~log n) — far
    # under the 64 an O(n) scan would cost
    import json as _json
    import os as _os

    big = str(tmp_path / "big")
    _os.makedirs(_os.path.join(big, "_snapshots"))
    for v in range(1, 65):
        with open(
            _os.path.join(big, "_snapshots", f"v{v:08d}.json"),
            "w",
            encoding="utf-8",
        ) as fh:
            _json.dump(
                {"version": v, "files": [], "schema": "{}",
                 "committed_at": 1000.0 + v},
                fh,
            )
    assert st.version_at_or_before(_Counting(), big, 1032.5) == 32
    assert _Counting.reads <= 2 * 7, f"{_Counting.reads} reads for n=64"


def test_memory_storage_pickles_a_readable_snapshot(spark, tmp_path):
    """The DataSource ships storage to executor worker processes by
    pickle: a MemorySnapshotStorage round-trip must carry the uploaded
    namespace with it (the process-global dict does not cross)."""
    root = str(tmp_path / "t")
    _build_table(spark, root, 2)
    mem_root = "mem://pickle-bucket/t"
    mem = _upload_to_memory(root, mem_root)
    clone = pickle.loads(pickle.dumps(mem))
    assert clone.list_versions(mem_root) == [1, 2]
    assert st.read_manifest(clone, mem_root, 2) == st.read_manifest(
        mem, mem_root, 2
    )


def test_datasource_reads_table_over_object_store_scheme(spark, tmp_path):
    """r7 verdict task 4 (offline form): one END-TO-END DataSource read
    over a non-local root — the table is uploaded into the flat://
    object store (flat percent-encoded keys, prefix listing, no
    directories/rename, whole-object BytesIO reads) and read back
    through spark.read.format('snapshot_table'), exercising the scheme
    dispatch in the plan worker AND the file-like parquet path in
    executor workers. (fsspec memory:// would model the same semantics
    but its namespace is per-process — it cannot cross Spark's worker
    boundary, and fsspec itself is absent offline.)"""
    import os

    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        register_snapshot_stream_source,
    )

    root = str(tmp_path / "t")
    _build_table(spark, root, 3)
    store_root = f"flat://{tmp_path}/objstore"
    flat = st.FlatObjectStorage()
    for dirpath, _dirs, names in os.walk(root):
        for n in names:
            if n.endswith(".crc") or n.startswith(".tmp-"):
                continue
            p = os.path.join(dirpath, n)
            with open(p, "rb") as fh:
                flat.put(store_root, os.path.relpath(p, root), fh.read())
    # the store is genuinely flat: one directory, zero subdirectories
    base = st.FlatObjectStorage._dir(store_root)
    assert all(os.path.isfile(os.path.join(base, n)) for n in os.listdir(base))
    # contract primitives over the flat namespace
    assert flat.list_versions(store_root) == [1, 2, 3]
    assert st.read_manifest(flat, store_root, 3) == jvm_read_manifest(
        spark, root, 3
    )
    register_snapshot_stream_source(spark)
    got = (
        spark.read.format("snapshot_table").option("root", store_root).load()
    )
    assert sorted((r.id, r.v) for r in got.collect()) == [
        (i, 2 * i) for i in range(30)
    ]
    # time travel through the same non-local path
    v1 = (
        spark.read.format("snapshot_table")
        .option("root", store_root)
        .option("version", "1")
        .load()
    )
    assert v1.count() == 10


def test_full_table_lifecycle_on_flat_object_store(spark, tmp_path):
    """r8 verdict task 2: the object-store WRITE loop, closed offline.
    A COMPLETE table lifecycle — write / append / dv-delete / cow-update
    / merge / OPTIMIZE / partition evolution / time travel / vacuum /
    STREAM — runs end-to-end against a flat:// root: every commit is one
    conditional whole-object PUT (no temp manifests, no rename
    anywhere), data files publish as whole objects before the CAS, the
    JVM scans the objects natively (tilde-escaped names), and the
    namespace stays genuinely FLAT throughout (zero subdirectories —
    the S3 constraint)."""
    import os

    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_delete,
        snapshot_history,
        snapshot_merge,
        snapshot_optimize,
        snapshot_repartition,
        snapshot_update,
        snapshot_vacuum,
    )

    root = f"flat://{tmp_path}/objstore"
    base = st.FlatObjectStorage._dir(root)

    def _assert_flat():
        assert all(
            os.path.isfile(os.path.join(base, n)) for n in os.listdir(base)
        ), "flat:// namespace grew a subdirectory"

    assert snapshot_write(
        spark.range(0, 100).selectExpr("id", "id % 5 AS grp"),
        root,
        stats_cols=["id"],
    ) == 1
    assert snapshot_write(
        spark.range(100, 200).selectExpr("id", "id % 5 AS grp"), root
    ) == 2
    _assert_flat()
    assert snapshot_read(spark, root).count() == 200
    # merge-on-read delete: vector parquet is itself a flat object
    assert snapshot_delete(spark, root, [("id", "<", 10)], mode="dv") == 3
    assert snapshot_read(spark, root).count() == 190
    assert (
        snapshot_update(spark, root, [("id", ">=", 190)], {"grp": "grp + 100"})
        == 4
    )
    assert snapshot_read(spark, root).where("grp >= 100").count() == 10
    assert (
        snapshot_merge(
            spark.range(150, 160).selectExpr("id", "id % 5 + 50 AS grp"),
            root,
            "id",
        )
        == 5
    )
    assert snapshot_optimize(spark, root, target_file_mb=64) == 6
    assert snapshot_read(spark, root).count() == 190
    assert snapshot_read(spark, root, 2).count() == 200  # time travel
    # partition evolution onto the object store, pruning included
    assert snapshot_repartition(spark, root, ["grp"]) == 7
    pruned = snapshot_read(spark, root, filters=[("grp", "=", 2)])
    assert pruned.count() == 34 and len(pruned.inputFiles()) < len(
        jvm_read_manifest(spark, root, 7)["files"]
    )
    hist = snapshot_history(spark, root)
    assert hist.count() == 7
    _assert_flat()
    # STREAM the table out through the DataSource over the same root
    # (fresh baseline: v7 is a rewrite, so start the stream from it)
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        register_snapshot_stream_source,
    )

    register_snapshot_stream_source(spark)
    snapshot_write(
        spark.range(200, 220).selectExpr("id", "id % 5 AS grp"), root
    )  # v8: streamable delta on top of the baseline
    dest, ckpt = str(tmp_path / "dest"), str(tmp_path / "ckpt")
    q = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("startingVersion", "7")
        .load()
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r.id for r in spark.read.parquet(dest).collect()) == list(
        range(200, 220)
    )
    # STREAMING INGEST into the store: the foreachBatch ledger commit
    assert snapshot_write(
        spark.range(220, 230).selectExpr("id", "id % 5 AS grp"),
        root,
        batch_id=0,
    ) == 9
    assert (  # replay is detected from the manifest ledger and skipped
        snapshot_write(
            spark.range(220, 230).selectExpr("id", "id % 5 AS grp"),
            root,
            batch_id=0,
        )
        is None
    )
    # retention: vacuum deletes via object verbs, survivors stay readable
    deleted = snapshot_vacuum(spark, root, keep_last=2, min_age_seconds=0)
    assert deleted and all(
        d.startswith(("data/", "_snapshots/")) for d in deleted
    )
    assert snapshot_read(spark, root).count() == 220  # 190 + 20 + 10
    with pytest.raises(Exception):
        snapshot_read(spark, root, 1).count()  # retired version
    _assert_flat()


def test_tip_pointer_o1_resolution_and_crash_safety(spark, tmp_path):
    """r8 verdict task 3: every commit writes an advisory
    ``_snapshots/_latest`` pointer; tip resolution reads it + a bounded
    forward reconcile instead of LISTing the manifest dir (Delta's
    ``_last_checkpoint`` + listFrom, VLDB'20 §3.1). Crash safety: a
    pointer OLDER than the tip (crash between manifest CAS and pointer
    update) reconciles forward; a MISSING pointer falls back to the
    LIST; a CORRUPT pointer (torn write on a non-atomic backend) also
    falls back — a bad pointer can never produce a wrong tip."""
    import json as _json
    import os

    from aws_logs_parquet_converter_spark.plans.snapshots import (
        current_version,
    )

    root = str(tmp_path / "t")
    _build_table(spark, root, 5)
    ptr = os.path.join(root, st.SNAP_DIR, st.POINTER_NAME)
    assert os.path.exists(ptr), "commit did not write the tip pointer"
    assert _json.load(open(ptr))["version"] == 5
    impl = st.LocalSnapshotStorage()

    class _Counting(st.LocalSnapshotStorage):
        lists = 0
        probes = 0

        def list_versions(self, r):
            _Counting.lists += 1
            return super().list_versions(r)

        def manifest_exists(self, r, v):
            _Counting.probes += 1
            return super().manifest_exists(r, v)

    # healthy pointer: zero LISTs, one verify + one tip+1 probe
    assert st.current_version_fast(_Counting(), root) == 5
    assert _Counting.lists == 0 and _Counting.probes <= 2
    # stale pointer (crash between CAS and pointer write, then more
    # commits): reconcile forward finds the true tip
    with open(ptr, "w", encoding="utf-8") as fh:
        _json.dump({"version": 2}, fh)
    assert st.current_version_fast(impl, root) == 5
    assert current_version(spark, root) == 5  # JVM path agrees
    # corrupt pointer: tolerant parse -> LIST fallback
    with open(ptr, "wb") as fh:
        fh.write(b'{"ver')  # torn write
    assert st.current_version_fast(impl, root) == 5
    # missing pointer: LIST fallback
    os.remove(ptr)
    assert st.current_version_fast(impl, root) == 5
    assert current_version(spark, root) == 5
    # pointer BEYOND the tip (copied from another table): verify fails
    # -> LIST fallback, not a phantom version
    with open(ptr, "w", encoding="utf-8") as fh:
        _json.dump({"version": 99}, fh)
    assert st.current_version_fast(impl, root) == 5
    # the next commit repairs the pointer
    snapshot_write(spark.range(50, 60).selectExpr("id", "id*2 AS v"), root)
    assert _json.load(open(ptr))["version"] == 6
    # and the listing itself never mistakes the pointer for a version
    assert impl.list_versions(root) == [1, 2, 3, 4, 5, 6]


def test_flat_put_if_absent_exactly_one_winner(tmp_path):
    """The flat store's conditional PUT is the LogStore primitive: many
    threads slam ONE manifest key with distinct payloads — exactly one
    wins per round, and the object on disk is byte-identical to the
    winner's payload (never a clobber, never a partial object). This is
    the same contention gate the file:// LogStore carries
    (tests/test_snapshots.py), parameterized over the object-store
    commit path."""
    from concurrent.futures import ThreadPoolExecutor

    store = st.FlatObjectStorage()
    root = f"flat://{tmp_path}/t"
    n_threads, n_rounds = 12, 6
    for rnd in range(n_rounds):
        key = f"{st.SNAP_DIR}/{st.manifest_name(100 + rnd)}"

        def attempt(w: int) -> tuple[bool, bytes]:
            payload = f'{{"round": {rnd}, "writer": {w}}}'.encode()
            return store.put_if_absent_bytes(root, key, payload), payload

        with ThreadPoolExecutor(max_workers=n_threads) as ex:
            results = list(ex.map(attempt, range(n_threads)))
        winners = [p for won, p in results if won]
        assert len(winners) == 1, f"round {rnd}: {len(winners)} winners"
        assert store.read_manifest_bytes(root, 100 + rnd) == winners[0]
    # no temp residue survives the contention
    import os

    assert not [
        n
        for n in os.listdir(st.FlatObjectStorage._dir(root))
        if n.startswith(".")
    ]


def test_abs_data_path_rules():
    assert st.abs_data_path("/t", "data/c/p.parquet") == "/t/data/c/p.parquet"
    assert st.abs_data_path("/t", "/abs/data/c/p.parquet") == "/abs/data/c/p.parquet"
    assert (
        st.abs_data_path("s3://b/t/", "data/c/p.parquet")
        == "s3://b/t/data/c/p.parquet"
    )
    assert (
        st.abs_data_path("/t", "s3://other/data/c/p.parquet")
        == "s3://other/data/c/p.parquet"
    )


def test_version_listing_ignores_temp_and_foreign_names():
    names = [
        "v00000001.json",
        "v00000010.json",
        ".tmp-abc.json",
        "vxx.json",
        "v2.txt",
        "_crc",
    ]
    assert st.parse_version_listing(names) == [1, 10]


def test_local_storage_empty_table_lists_nothing(tmp_path):
    assert st.LocalSnapshotStorage().list_versions(str(tmp_path / "nope")) == []


def test_seam_feeds_snapshot_read_equivalence(spark, tmp_path):
    """End-to-end: the rows snapshot_read (JVM path) returns equal the
    rows reconstructed from the seam's manifests + pyarrow (the
    DataSource path) — the two readers cannot drift."""
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    _build_table(spark, root, MANIFEST_CHECKPOINT_EVERY + 1)
    jvm_rows = sorted(
        (r.id, r.v) for r in snapshot_read(spark, root).collect()
    )
    impl = st.LocalSnapshotStorage()
    m = st.read_manifest(impl, root, impl.list_versions(root)[-1])
    seam_rows = []
    for entry in m["files"]:
        t = pq.read_table(impl.open_data_file(root, entry))
        seam_rows.extend(zip(t.column("id").to_pylist(), t.column("v").to_pylist()))
    assert sorted(seam_rows) == jvm_rows


# ---------------------------------------------------------------------------
# protocol feature flags (readerFeatures / writerFeatures)
# ---------------------------------------------------------------------------


def test_compact_manifest_roundtrip_pure():
    """encode/decode are exact inverses over full AND delta raw forms,
    sparse per-file dicts included (a file with no stats entry)."""
    full = {
        "version": 20,
        "action": "append",
        "schema": "{}",
        "files": [f"data/c/{i:04d}.parquet" for i in range(200)],
        "stats_cols": ["id"],
        "stats": {f"data/c/{i:04d}.parquet": {"id": [i, i + 1]} for i in range(150)},
        "sizes": {f"data/c/{i:04d}.parquet": 100 + i for i in range(200)},
        "txns": {"a": 3},
        "committed_at": 5.0,
    }
    delta = {
        "version": 21,
        "base": 20,
        "adds": full["files"][:40],
        "removes": full["files"][40:80],
        "stats_cols": ["id"],
        "stats_adds": {f: {"id": [0, 1]} for f in full["files"][:40]},
        "sizes_adds": {f: 7 for f in full["files"][:40]},
        "committed_at": 6.0,
    }
    # the one delta key whose entries legitimately EXCEED its aligning
    # list: sizes_adds carries the one-time whole-table sizes backfill
    # on the first post-upgrade commit (keys far beyond `adds`) — the
    # compact form must keep those as a residual, not drop them (r10
    # self-review finding #1: dropped residuals leave resolved sizes
    # partial forever and re-trigger the per-file stat backfill on
    # every later commit)
    backfill_delta = {
        "version": 22,
        "base": 21,
        "adds": full["files"][:10],
        "removes": [],
        "sizes_adds": {f: 55 for f in full["files"]},  # ALL live files
        "committed_at": 7.0,
    }
    old = st.MANIFEST_COMPACT_MIN_BYTES
    old_fmt = st.MANIFEST_BIG_FORMAT
    st.MANIFEST_COMPACT_MIN_BYTES = 1
    try:
        st.MANIFEST_BIG_FORMAT = "gzip"
        for raw in (full, delta, backfill_delta):
            blob = st.encode_manifest_bytes(raw)
            assert blob[:2] == b"\x1f\x8b"  # gzip magic: compact form
            dec = st.decode_manifest_bytes(blob)
            want = {
                **raw,
                "reader_features": ["compact-manifests"],
                "writer_features": ["compact-manifests"],
            }
            assert dec == want
        # the r11 PARQUET big form round-trips the same raws exactly
        # (lazy sections compare equal to the plain dicts)
        st.MANIFEST_BIG_FORMAT = "parquet"
        for raw in (full, delta, backfill_delta):
            blob = st.encode_manifest_bytes(raw)
            assert blob[:4] == b"PAR1"
            dec = st.decode_manifest_bytes(blob)
            want = {
                **raw,
                "reader_features": ["checkpoint-parquet"],
                "writer_features": ["checkpoint-parquet"],
            }
            assert st.materialize_manifest(dec) == want
    finally:
        st.MANIFEST_COMPACT_MIN_BYTES = old
        st.MANIFEST_BIG_FORMAT = old_fmt
    # below the threshold: plain sorted-key JSON, byte-identical to r9
    small = {"version": 1, "files": ["a"], "schema": "{}"}
    import json as _json

    assert st.encode_manifest_bytes(small) == _json.dumps(
        small, sort_keys=True
    ).encode("utf-8")


def test_compact_manifests_end_to_end(spark, tmp_path, monkeypatch):
    """With the threshold forced to 0, EVERY manifest a table writes is
    compact — and the whole lifecycle (append/delta chains/time travel/
    stream commits/every seam impl) reads identically. The shape the
    13 MB checkpoint takes at the 100k-file design point, exercised on
    the full protocol."""
    import json as _json
    import os

    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "gzip")
    root = str(tmp_path / "t")
    n = MANIFEST_CHECKPOINT_EVERY + 3
    _build_table(spark, root, n)
    snapshot_write(
        spark.range(500, 505).selectExpr("id", "id * 2 AS v"),
        root,
        batch_id=0,
    )
    # on disk: gzip, not JSON — and the feature is stamped inside
    sd = os.path.join(root, "_snapshots")
    with open(os.path.join(sd, "v00000001.json"), "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"
    m = jvm_read_manifest(spark, root, n + 1)
    assert "compact-manifests" in m["reader_features"]
    assert m["stream_txns"] == {"_stream": 0}
    # every seam impl resolves the same manifests (incl. delta chains)
    for name, impl, r in _impls(root):
        for v in (1, n // 2, n + 1):
            assert st.read_manifest(impl, r, v) == jvm_read_manifest(
                spark, root, v
            ), (name, v)
    # rows and time travel behave identically to plain-JSON tables
    assert snapshot_read(spark, root).count() == 10 * n + 5
    assert snapshot_read(spark, root, version=2).count() == 20
    # a build WITHOUT the codec feature refuses BY NAME, not by misread
    monkeypatch.setattr(
        st,
        "SUPPORTED_READER_FEATURES",
        st.SUPPORTED_READER_FEATURES - {"compact-manifests"},
    )
    with pytest.raises(ValueError, match="compact-manifests"):
        jvm_read_manifest(spark, root, n + 1)


def test_compact_and_plain_manifests_interleave(spark, tmp_path, monkeypatch):
    """A table can mix encodings version-by-version (the threshold is
    per-payload): readers sniff magic bytes, so a history of plain
    deltas over a compact checkpoint — the real steady state — resolves
    exactly."""
    root = str(tmp_path / "t")
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "gzip")
    _build_table(spark, root, 3)  # plain (tiny)
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    _build_table(spark, root, 2)  # compact
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 256 * 1024)
    _build_table(spark, root, 2)  # plain again
    assert snapshot_read(spark, root).count() == 10 * 7
    for v in range(1, 8):
        assert len(jvm_read_manifest(spark, root, v)["files"]) >= 1


def test_feature_stamps_derive_from_manifest_keys(spark, tmp_path):
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        read_manifest,
        snapshot_delete,
        snapshot_drop_column,
        snapshot_optimize,
        snapshot_rename_column,
        snapshot_write,
    )

    root = str(tmp_path / "t")
    snapshot_write(
        spark.range(0, 10).selectExpr("id", "id * 2 AS v", "id AS w"), root
    )
    assert "reader_features" not in read_manifest(spark, root, 1)
    snapshot_delete(spark, root, [("id", "<", 2)], mode="dv")
    m = read_manifest(spark, root, 2)
    assert m["reader_features"] == ["deletion-vectors"]
    assert m["writer_features"] == ["deletion-vectors"]
    # OPTIMIZE purges the vectors: the stamp goes with them
    snapshot_optimize(spark, root, full=True)
    assert "reader_features" not in read_manifest(spark, root, 3)
    snapshot_rename_column(spark, root, "v", "val")
    assert read_manifest(spark, root, 4)["reader_features"] == [
        "column-mapping"
    ]
    # renaming BACK clears the mapping — and the stamp (no stale lockout)
    snapshot_rename_column(spark, root, "val", "v")
    assert "reader_features" not in read_manifest(spark, root, 5)
    snapshot_drop_column(spark, root, "w")
    m = read_manifest(spark, root, 6)
    assert "reader_features" not in m  # drop alone: readers unaffected
    assert m["writer_features"] == ["dropped-column-tombstones"]


def test_unknown_reader_feature_refuses_every_read_path(spark, tmp_path):
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _try_commit,
        read_manifest,
        snapshot_read,
        snapshot_write,
    )
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        register_snapshot_stream_source,
    )

    root = str(tmp_path / "t")
    snapshot_write(spark.range(0, 5).selectExpr("id", "id * 2 AS v"), root)
    m1 = read_manifest(spark, root, 1)
    fut = {
        "version": 2,
        "action": "append",
        "schema": m1["schema"],
        "files": m1["files"],
        "reader_features": ["v9-frobnication"],
    }
    assert _try_commit(spark, root, fut, prev=m1)
    with pytest.raises(ValueError, match="v9-frobnication"):
        snapshot_read(spark, root)
    register_snapshot_stream_source(spark)
    with pytest.raises(Exception, match="v9-frobnication"):
        spark.read.format("snapshot_table").option("root", root).load().count()
    # the stream's raw walk refuses too
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        _delta_files,
    )
    from aws_logs_parquet_converter_spark.storage import storage_for_root

    with pytest.raises(ValueError, match="v9-frobnication"):
        _delta_files(storage_for_root(root), root, 0, 2)
    # a writer building on the future version refuses (reader subset)
    with pytest.raises(ValueError, match="v9-frobnication"):
        snapshot_write(spark.range(5, 6).selectExpr("id", "id * 2 AS v"), root)
    # time travel BEFORE the future commit still works
    assert snapshot_read(spark, root, version=1).count() == 5


def test_unknown_writer_feature_reads_but_refuses_mutation(spark, tmp_path):
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _try_commit,
        read_manifest,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )

    root = str(tmp_path / "t")
    snapshot_write(spark.range(0, 5).selectExpr("id", "id * 2 AS v"), root)
    m1 = read_manifest(spark, root, 1)
    fut = {
        "version": 2,
        "action": "append",
        "schema": m1["schema"],
        "files": m1["files"],
        "writer_features": ["v9-conditional-updates"],
    }
    assert _try_commit(spark, root, fut, prev=m1)
    # reads are unaffected — the feature only constrains mutation
    assert snapshot_read(spark, root).count() == 5
    with pytest.raises(ValueError, match="v9-conditional-updates"):
        snapshot_write(spark.range(5, 6).selectExpr("id", "id * 2 AS v"), root)
    with pytest.raises(ValueError, match="v9-conditional-updates"):
        snapshot_vacuum(spark, root, keep_last=1, min_age_seconds=0)


def test_unknown_writer_feature_refuses_datasource_writer(spark, tmp_path):
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        _try_commit,
        read_manifest,
        snapshot_write,
    )
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        register_snapshot_stream_source,
    )

    root = str(tmp_path / "t")
    snapshot_write(spark.range(0, 5).selectExpr("id", "id * 2 AS v"), root)
    m1 = read_manifest(spark, root, 1)
    assert _try_commit(
        spark,
        root,
        {
            "version": 2,
            "action": "append",
            "schema": m1["schema"],
            "files": m1["files"],
            "writer_features": ["v9-conditional-updates"],
        },
        prev=m1,
    )
    register_snapshot_stream_source(spark)
    with pytest.raises(Exception, match="v9-conditional-updates"):
        spark.range(5, 6).selectExpr("id", "id * 2 AS v").write.format(
            "snapshot_table"
        ).mode("append").option("root", root).save()


def test_chain_feature_carries_onto_plain_deltas(spark, tmp_path, monkeypatch):
    """r10 ADVICE: a plain-JSON delta whose resolution chain crosses a
    compact checkpoint must ADVERTISE `compact-manifests` in its own
    stored payload — a feature-aware build lacking the codec then
    refuses BY NAME at the tip instead of crashing raw mid-chain. A
    later plain FULL checkpoint starts a fresh chain and drops the
    carry."""
    import json as _json
    import os

    root = str(tmp_path / "t")
    # version 10 (a checkpoint multiple) stores FULL and COMPACT
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "gzip")
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    _build_table(spark, root, MANIFEST_CHECKPOINT_EVERY)
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 256 * 1024)
    _build_table(spark, root, 2)  # v11, v12: plain deltas on the compact base
    local = st.LocalSnapshotStorage()
    ckpt_raw = local.read_manifest_bytes(root, MANIFEST_CHECKPOINT_EVERY)
    assert ckpt_raw[:2] == b"\x1f\x8b"
    for v in (MANIFEST_CHECKPOINT_EVERY + 1, MANIFEST_CHECKPOINT_EVERY + 2):
        data = local.read_manifest_bytes(root, v)
        assert data[:2] != b"\x1f\x8b"  # plain JSON delta
        raw = _json.loads(data.decode("utf-8"))
        assert "base" in raw
        assert "compact-manifests" in raw.get("reader_features", [])
        assert "compact-manifests" in raw.get("writer_features", [])
    # the resolved view advertises it too (chain union)
    m = jvm_read_manifest(spark, root, MANIFEST_CHECKPOINT_EVERY + 2)
    assert "compact-manifests" in m["reader_features"]
    # a codec-less feature-aware build refuses the TIP by name — before
    # any chain walk reaches the gzip checkpoint
    monkeypatch.setattr(
        st,
        "SUPPORTED_READER_FEATURES",
        st.SUPPORTED_READER_FEATURES - {"compact-manifests"},
    )
    with pytest.raises(ValueError, match="compact-manifests"):
        st.read_manifest(local, root, MANIFEST_CHECKPOINT_EVERY + 2)
    monkeypatch.undo()
    # drive to the NEXT checkpoint (v20, plain full): the carry stops
    _build_table(spark, root, MANIFEST_CHECKPOINT_EVERY - 2)
    v20 = 2 * MANIFEST_CHECKPOINT_EVERY
    data = local.read_manifest_bytes(root, v20)
    assert data[:2] != b"\x1f\x8b"
    raw = _json.loads(data.decode("utf-8"))
    assert "files" in raw  # full checkpoint
    assert "compact-manifests" not in raw.get("reader_features", [])
    _build_table(spark, root, 1)  # v21: delta on the PLAIN checkpoint
    raw21 = _json.loads(local.read_manifest_bytes(root, v20 + 1).decode())
    assert "compact-manifests" not in raw21.get("reader_features", [])
    assert snapshot_read(spark, root).count() == 10 * (v20 + 1)


def test_parquet_manifests_end_to_end(spark, tmp_path, monkeypatch):
    """r11 twin of the compact e2e: with the threshold forced to 0 and
    the parquet big form selected, EVERY manifest a table writes is an
    embedded parquet payload — and the whole lifecycle (append/delta
    chains/time travel/stream commits/every seam impl) reads
    identically, with `files`/`stats`/`sizes`/`partitions` coming back
    as lazy containers that compare equal to the JVM reader's plain
    dicts. A codec-less feature-aware build refuses BY NAME."""
    import json as _json
    import os

    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "parquet")
    root = str(tmp_path / "t")
    n = MANIFEST_CHECKPOINT_EVERY + 3
    _build_table(spark, root, n)
    snapshot_write(
        spark.range(500, 505).selectExpr("id", "id * 2 AS v"),
        root,
        batch_id=0,
    )
    # on disk: parquet magic, feature stamped inside the footer header
    sd = os.path.join(root, "_snapshots")
    with open(os.path.join(sd, "v00000001.json"), "rb") as fh:
        assert fh.read(4) == b"PAR1"
    m = jvm_read_manifest(spark, root, n + 1)
    assert "checkpoint-parquet" in m["reader_features"]
    assert m["stream_txns"] == {"_stream": 0}
    # every seam impl resolves the same manifests (incl. delta chains);
    # materialize both sides so lazy-vs-plain compares value-exact
    for name, impl, r in _impls(root):
        for v in (1, n // 2, n + 1):
            assert st.materialize_manifest(
                st.read_manifest(impl, r, v)
            ) == st.materialize_manifest(jvm_read_manifest(spark, root, v)), (
                name,
                v,
            )
    # rows, filters (stats pruning through lazy sections), time travel
    assert snapshot_read(spark, root).count() == 10 * n + 5
    assert snapshot_read(spark, root, version=2).count() == 20
    assert (
        snapshot_read(spark, root, filters=[("id", "<", 10)]).count() == 10
    )
    # a build WITHOUT the codec feature refuses BY NAME, not by misread
    monkeypatch.setattr(
        st,
        "SUPPORTED_READER_FEATURES",
        st.SUPPORTED_READER_FEATURES - {"checkpoint-parquet"},
    )
    with pytest.raises(ValueError, match="checkpoint-parquet"):
        jvm_read_manifest(spark, root, n + 1)


def test_all_three_encodings_interleave(spark, tmp_path, monkeypatch):
    """One history mixing plain JSON, gzip compact, and parquet
    manifests version-by-version resolves exactly — readers sniff magic
    bytes per payload, and a plain delta atop a PARQUET checkpoint
    advertises `checkpoint-parquet` on its own payload (the chain-
    feature carry extends to the r11 form)."""
    import json as _json

    root = str(tmp_path / "t")
    _build_table(spark, root, 3)  # plain (tiny)
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "gzip")
    _build_table(spark, root, 2)  # gzip compact (v4, v5)
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "parquet")
    _build_table(spark, root, 5)  # parquet (v6..v10; v10 = checkpoint)
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 256 * 1024)
    _build_table(spark, root, 2)  # plain deltas on the parquet ckpt
    assert snapshot_read(spark, root).count() == 10 * 12
    local = st.LocalSnapshotStorage()
    assert local.read_manifest_bytes(root, 10)[:4] == b"PAR1"
    for v in (11, 12):
        data = local.read_manifest_bytes(root, v)
        raw = _json.loads(data.decode("utf-8"))
        assert "checkpoint-parquet" in raw.get("reader_features", [])
    for v in range(1, 13):
        assert len(list(jvm_read_manifest(spark, root, v)["files"])) >= 1


def test_parquet_manifest_partition_pruning(spark, tmp_path, monkeypatch):
    """Partition-value pruning reads THROUGH the lazy partitions section
    of a parquet-form manifest: a filter on the partition column opens
    only that tuple's files (inputFiles-asserted), values exact."""
    monkeypatch.setattr(st, "MANIFEST_COMPACT_MIN_BYTES", 1)
    monkeypatch.setattr(st, "MANIFEST_BIG_FORMAT", "parquet")
    root = str(tmp_path / "t")
    df = spark.range(0, 300).selectExpr(
        "id", "case when id % 3 = 0 then 'a' when id % 3 = 1 then 'b' end as g"
    )
    snapshot_write(df, root, partition_by=["g"], stats_cols=["id"])
    snapshot_write(
        spark.range(300, 360).selectExpr("id", "'a' as g"), root
    )
    local = st.LocalSnapshotStorage()
    assert local.read_manifest_bytes(root, 1)[:4] == b"PAR1"
    assert local.read_manifest_bytes(root, 2)[:4] == b"PAR1"
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_read as sread,
    )

    got = sread(spark, root, filters=[("g", "=", "a")])
    opened = got.inputFiles()
    assert opened and all("__pv_g=a" in p for p in opened)
    assert got.count() == 100 + 60
    # the hive-null dir holds the NULL g rows; they read back as NULL
    assert sread(spark, root).where("g is null").count() == 100
    # stats + partition predicates compose through both lazy sections
    both = sread(spark, root, filters=[("g", "=", "b"), ("id", "<", 30)])
    assert both.count() == 10
