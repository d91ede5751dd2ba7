"""WRITE halves of the ``snapshot_table`` Python DataSource — Spark 4's
``DataSource.writer`` (batch) and ``DataSource.streamWriter`` (streaming
sink), committing through the SAME manifest protocol as
``plans.snapshots.snapshot_write``:

    df.write.format("snapshot_table").option("root", path)
      .mode("append").save()

    df.writeStream.format("snapshot_table").option("root", path)
      .option("checkpointLocation", ckpt).start()

This retires the engine's documented write asymmetry (reads worked
through the DataSource, writes required the Python API — SCALE.md's
SQL-DML boundary): a table is now writable through the standard
DataFrame writer AND drainable by a native streaming sink (previously
foreachBatch-only).

Execution model, designed for the 1000-executor case:

- **Executors write and publish data objects directly.** Each task
  streams its Arrow batches into parquet files staged locally, then
  publishes them under commit-unique names (``data/<32hex>/...``) via
  the storage seam — ``LocalSnapshotStorage.put_file`` for plain roots,
  ``WritableObjectStorage.put_file`` (whole-object PUT, no rename) for
  registered object-store roots. No row ever crosses the driver.
- **Per-file min/max stats are gathered IN the write task** from the
  Arrow batches it is already holding (``pyarrow.compute.min_max``) and
  shipped in the task's commit message — the data-skipping stats cost
  zero extra IO, one better than ``snapshot_write``'s post-write
  column-pruned pass.
- **The driver-side ``commit()`` is pure metadata**: assemble the
  manifest from the collected commit messages and publish it with ONE
  conditional put (the ``link(2)`` / If-None-Match LogStore primitive),
  under the same CAS-rebase retry loop, in-commit timestamp stamping,
  and delta encoding as every other commit path
  (``plans.snapshots._finalize_commit``). It runs in the DataSource's
  Python worker, where no SparkSession exists — everything here is
  deliberately session-free.
- **Exactly-once**: the streaming sink records its high-water mark in
  the manifest's ``stream_txns`` ledger under a stable per-stream app id
  (``streamAppId`` option, else derived from the checkpoint location —
  Delta's SetTransaction keyed on query identity) and SKIPS a
  re-delivered batch before committing (batch ids are monotone per
  checkpoint; the replayed attempt's freshly published files are
  unreferenced residue — deleted best-effort, inert for vacuum
  otherwise). The ledger is a SCALAR, so manifest bytes stay O(1) in
  stream lifetime; legacy cumulative ``batch_ids`` lists from pre-r10
  builds are honored and folded. Batch writes take
  ``txnAppId``/``txnVersion`` options for idempotent job retries.

Scoped boundaries (each refused with an actionable error, never a wrong
result): CHECK-constraint tables (validation needs the engine's SQL
pass — use ``snapshot_write``), bloom-sidecar tables (the sidecar build
is a Spark pass), column-mapped tables (the batch reader refuses those
too), and ``mem://`` roots (a per-process namespace cannot cross the
worker boundary). Roots served by fsspec remotes are refused because no
conditional-put primitive exists there; register a
:class:`~..storage.WritableObjectStorage` scheme instead.

Reference parity: the reference pipeline writes plain parquet with no
transactional layer (aws-logs-parquet-converter
``converters/s3-server-access-log/converter.py`` — ``DataFrame.write
.parquet`` and nothing else); this sink is the Delta-writer analog
(Armbrust et al., VLDB'20 §3.1-3.2: add actions with sizes/stats/
partitionValues, LogStore conditional put, SetTransaction) re-expressed
over the engine's manifest protocol.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid
from dataclasses import dataclass

from .. import storage as _storage
from ..storage import (
    SNAP_DIR,
    LazySection,
    LocalSnapshotStorage,
    WritableObjectStorage,
    current_version_fast,
    ensure_writable,
    manifest_name,
    read_manifest,
    rebase_files,
    rebase_section,
    storage_for_root,
)

try:  # pyspark >= 4
    from pyspark.sql.datasource import (
        DataSourceArrowWriter,
        DataSourceStreamArrowWriter,
        WriterCommitMessage,
    )
except ImportError:  # pragma: no cover - pyspark < 4
    DataSourceArrowWriter = object  # type: ignore[assignment,misc]
    DataSourceStreamArrowWriter = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]


@dataclass
class _FilesMessage(WriterCommitMessage):
    """One task's published files: ``[{rel, size, stats}, ...]``."""

    files: list


# ---------------------------------------------------------------------------
# plan-time resolution (driver-side Python worker)
# ---------------------------------------------------------------------------


def _normalize_checkpoint(ckpt: str, absolutize: bool) -> str:
    """Shared checkpoint-path normalizer. ``absolutize`` replays the
    r11-era behavior (relative local spellings resolved against the
    driver CWD) — kept ONLY so :func:`_stream_app_legacy_aliases` can
    recompute that generation's hash; the current identity never calls
    it with True (a CWD-dependent identity differs run-to-run)."""
    import re

    norm = ckpt.strip()
    if norm.startswith("file:"):
        rest = norm[len("file:"):]
        if rest.startswith("//"):
            # file URI authority (empty or localhost) — strip to the path
            rest = rest[2:]
            cut = rest.find("/")
            rest = rest[cut:] if cut >= 0 else "/"
        norm = rest
    if "://" not in norm:
        # local path: normpath so /a//b, /a/./b and a/../a hash
        # identically. Relative spellings normalize but do NOT
        # absolutize (r12): the driver CWD can differ run-to-run, which
        # would derive a different identity for the same checkpoint.
        if absolutize:
            norm = os.path.abspath(norm)
        norm = os.path.normpath(norm)
    else:
        scheme, rest = norm.split("://", 1)
        authority, _, path = rest.partition("/")
        path = re.sub(r"/+", "/", "/" + path)
        norm = f"{scheme}://{authority}{path}"
    return norm.rstrip("/") or "/"


def _hash_app(norm: str) -> str:
    import hashlib

    return "stream-" + hashlib.md5(norm.encode("utf-8")).hexdigest()[:16]


def stream_app_for_checkpoint(ckpt: str) -> str:
    """The sink's derived replay identity for a checkpoint location —
    ``stream-<md5 of the NORMALIZED path>``. Spark treats every
    respelling of the same location as the SAME checkpoint (the
    restarted query resumes and may re-deliver its last batch), so
    hashing the verbatim option string would mint a fresh identity for
    a respelled path and wave the replay through (r10 self-review
    finding #4). Normalization therefore goes beyond scheme/trailing-
    slash stripping (r11, r10 ADVICE): a ``file:`` URI drops its
    authority (``file://localhost/x`` == ``file:///x`` == ``/x``),
    local/schemeless paths are ``normpath``-ed (``..`` segments,
    duplicated slashes) — relative spellings deliberately NOT
    absolutized (r12): the driver CWD differs run-to-run and from
    Hadoop's working-dir resolution, so an identity derived through it
    is unstable — and remote URIs get their path component
    slash-collapsed. Tables whose ledger was keyed by an EARLIER
    generation's normalization are found via
    :func:`_stream_app_legacy_aliases` at commit time. Delta keys
    SetTransaction on the checkpoint's queryId; the path is the stable
    proxy available to a Python DataSource — pass ``streamAppId``
    explicitly to decouple identity from location entirely."""
    return _hash_app(_normalize_checkpoint(ckpt, absolutize=False))


def _stream_app_legacy_aliases(ckpt: str) -> list[str]:
    """Derived ids EARLIER builds minted for the same checkpoint
    spelling, most-recent generation first. An upgraded table's
    ``stream_txns`` ledger may be keyed under one of these (r12,
    advisor finding): the r10 normalization only stripped a ``file:``
    prefix and trailing slashes (``file://localhost/x`` hashed as
    ``localhost/x``; ``/a//b`` kept its doubled slash), and r11
    absolutized relative spellings against the driver CWD. On a ledger
    miss for the current derived id, the commit path probes these and
    folds a hit onto the current key — otherwise the engine's
    re-delivered last batch after an upgrade would pass the replay
    check and commit twice. The r11 alias for a relative spelling is
    recomputed against the CURRENT cwd — best effort, exact when the
    restart runs from the same directory (any other cwd could not be
    derived here or anywhere)."""
    import hashlib

    cur = stream_app_for_checkpoint(ckpt)
    out: list[str] = []
    # r11: identical except relative local paths were absolutized
    r11 = _hash_app(_normalize_checkpoint(ckpt, absolutize=True))
    if r11 != cur:
        out.append(r11)
    # r10: strip file:// / file: prefix, rstrip slashes, hash verbatim
    n10 = ckpt.strip()
    for prefix in ("file://", "file:"):
        if n10.startswith(prefix):
            n10 = n10[len(prefix):]
            break
    n10 = n10.rstrip("/") or "/"
    r10 = "stream-" + hashlib.md5(n10.encode("utf-8")).hexdigest()[:16]
    if r10 != cur and r10 not in out:
        out.append(r10)
    return out


def _store_for_write(root: str):
    """The storage impl a DataSource WRITE may commit through: plain
    local roots (``LocalSnapshotStorage``, link(2) conditional create)
    or a registered object-store scheme (``WritableObjectStorage``,
    conditional whole-object PUT). Everything else lacks an atomic
    put-if-absent from this process and is refused — committing anyway
    would reintroduce the lost-commit race the protocol exists to
    prevent."""
    store = storage_for_root(root)
    if isinstance(store, WritableObjectStorage):
        return store
    if isinstance(store, LocalSnapshotStorage):
        return store
    raise ValueError(
        f"the snapshot_table writer cannot commit to {root!r}: the root "
        "resolves to a storage backend without an atomic put-if-absent "
        "(mem:// is per-process; fsspec remotes have no conditional "
        "put). Use a local path, a registered WritableObjectStorage "
        "scheme (register_storage_scheme), or the engine's "
        "plans.snapshots.snapshot_write."
    )


def _refuse_unsupported(m: dict) -> None:
    """Table properties the DataSource writer cannot honor — refuse
    LOUDLY rather than commit a version that silently drops them."""
    if m.get("column_mapping"):
        raise ValueError(
            "the snapshot_table writer does not support column-mapped "
            "tables (a column was renamed via snapshot_rename_column); "
            "use plans.snapshots.snapshot_write, which relabels frames "
            "to physical names"
        )
    if m.get("constraints"):
        raise ValueError(
            "this table declares CHECK constraints; validating them "
            "needs the engine's SQL pass — write through "
            "plans.snapshots.snapshot_write"
        )
    if m.get("bloom"):
        raise ValueError(
            "this table records bloom sidecars; building them needs a "
            "Spark pass over the commit — write through "
            "plans.snapshots.snapshot_write"
        )


def _refuse_tombstoned_readds(m: dict, names) -> None:
    """An append RE-ADDING a dropped column's name needs a fresh
    physical name via the column mapping (stale values inside pre-drop
    files would resurrect otherwise) — a Spark-side relabel this
    session-free writer cannot run. Refuse loudly with the supported
    path; appends that do not touch tombstoned names pass."""
    import json as _json

    tombs = set(m.get("dropped_cols", []))
    if not tombs:
        return
    from pyspark.sql.types import StructType

    prev = set(StructType.fromJson(_json.loads(m["schema"])).names)
    readds = sorted((set(names) - prev) & tombs)
    if readds:
        raise ValueError(
            f"column(s) {readds} re-add a DROPPED column's name "
            "(snapshot_drop_column tombstones); mapping them to fresh "
            "physical names needs the engine's write path — use "
            "plans.snapshots.snapshot_write"
        )


def _plan_write(schema, options, overwrite: bool, streaming: bool) -> dict:
    """Resolve and validate everything a write needs, ONCE, driver-side:
    the storage impl, mode, partition columns (option ``partitionBy`` as
    a comma list, else inherited — a table property), stats columns
    (option ``stats``, else inherited on append, exactly
    ``snapshot_write``'s rule), idempotence options, and the fail-fast
    schema/type checks. Returns a picklable config dict; the commit
    re-validates state-dependent pieces under the CAS loop."""
    from ..plans.snapshots import _PART_TYPES, _merge_schemas

    root = options.get("root")
    if not root:
        raise ValueError("snapshot_table writer requires option 'root'")
    store = _store_for_write(root)
    mode = "overwrite" if overwrite else "append"
    if streaming and overwrite:
        raise ValueError(
            "the snapshot_table streaming sink supports the append "
            "output mode only (complete-mode rewrites have no replay "
            "ledger semantics); aggregate via foreachBatch + "
            "snapshot_write if you need per-batch overwrites"
        )
    latest = current_version_fast(store, root)
    latest_m = read_manifest(store, root, latest) if latest is not None else None
    if latest_m is not None:
        _refuse_unsupported(latest_m)
        ensure_writable(latest_m, root)  # unknown writerFeatures gate
        if mode == "append":
            from pyspark.sql.types import StructType

            _merge_schemas(  # fail fast on a type change
                StructType.fromJson(json.loads(latest_m["schema"])), schema
            )
            _refuse_tombstoned_readds(latest_m, schema.names)
    raw_pcols = options.get("partitionby")
    if raw_pcols is not None:
        pcols = [c.strip() for c in raw_pcols.split(",") if c.strip()]
        prev_pby = (latest_m or {}).get("partition_by")
        if prev_pby is not None and mode == "append" and pcols != prev_pby:
            raise ValueError(
                f"option partitionBy {pcols} conflicts with the table's "
                f"existing partition columns {prev_pby} — partitioning "
                "changes require mode('overwrite')"
            )
    else:
        pcols = (latest_m or {}).get("partition_by")
    ptypes: dict[str, str] = {}
    if pcols:
        by_name = {f.name: f.dataType.typeName() for f in schema.fields}
        missing = sorted(set(pcols) - set(by_name))
        if missing:
            raise ValueError(f"partition column(s) {missing} not in the frame")
        for c in pcols:
            if by_name[c] not in _PART_TYPES:
                raise TypeError(
                    f"partition column {c!r} has type {by_name[c]} — only "
                    f"{'/'.join(_PART_TYPES)} round-trip losslessly "
                    "through directory names"
                )
            ptypes[c] = by_name[c]
    raw_stats = options.get("stats")
    if raw_stats is not None:
        stats_cols = [c.strip() for c in raw_stats.split(",") if c.strip()]
    elif mode == "append" and latest_m is not None:
        stats_cols = latest_m.get("stats_cols")
    else:
        stats_cols = None
    txn_app = options.get("txnappid")
    txn_version = options.get("txnversion")
    if (txn_app is None) != (txn_version is None):
        raise ValueError(
            "txnAppId and txnVersion declare an idempotent transaction "
            "together — pass both or neither"
        )
    if streaming and txn_app is not None:
        raise ValueError(
            "txnAppId/txnVersion are batch options; the streaming sink "
            "is already idempotent per micro-batch (stream_txns HWM "
            "ledger)"
        )
    stream_app = None
    stream_app_derived = False
    stream_app_aliases: list[str] = []
    if streaming:
        # the stream's replay-ledger identity (stream_txns key): an explicit
        # streamAppId option wins; else derived from the checkpoint
        # location — the SAME checkpoint must be reused for a restart to
        # replay at all, so it is the stable query identity (Delta's
        # sink keys SetTransaction on the checkpoint's queryId the same
        # way). A checkpoint-less corner (none in practice: Spark
        # requires one) falls back to the reserved single-stream key.
        stream_app = options.get("streamappid")
        if stream_app is None:
            ckpt = options.get("checkpointlocation")
            if ckpt:
                stream_app = stream_app_for_checkpoint(ckpt)
                stream_app_derived = True
                stream_app_aliases = _stream_app_legacy_aliases(ckpt)
            else:
                from ..plans.snapshots import DEFAULT_STREAM_APP

                stream_app = DEFAULT_STREAM_APP
    mrpf = options.get("maxrecordsperfile")
    return {
        "root": root,
        "store": store,
        "mode": mode,
        "schema_json": schema.json(),
        "pcols": list(pcols) if pcols else None,
        "ptypes": ptypes,
        "stats_cols": list(stats_cols) if stats_cols else None,
        "max_records": int(mrpf) if mrpf else None,
        "txn_app": txn_app,
        "txn_version": int(txn_version) if txn_version is not None else None,
        "stream_app": stream_app,
        "stream_app_derived": stream_app_derived,
        "stream_app_aliases": stream_app_aliases,
        "commit_name": uuid.uuid4().hex,
    }


# ---------------------------------------------------------------------------
# executor-side task: stream Arrow batches into published parquet objects
# ---------------------------------------------------------------------------


def _part_segment(col: str, value, type_name: str) -> str:
    """One ``__pv_<col>=<value>`` directory segment, encoded exactly the
    way Spark's ``partitionBy`` lays directories out (and
    ``plans.snapshots._parse_partition_values`` decodes): NULL — and,
    for strings, ``''``, which Spark also cannot distinguish in a
    directory name — become the hive null dir; booleans lowercase;
    dates ISO; strings percent-escaped."""
    from urllib.parse import quote

    from ..plans.snapshots import _HIVE_NULL, _PART_PREFIX

    if value is None or (type_name == "string" and value == ""):
        s = _HIVE_NULL
    elif type_name == "boolean":
        s = "true" if value else "false"
    elif type_name == "date":
        s = value.isoformat()
    elif type_name == "string":
        s = quote(value, safe="")
    else:
        s = str(value)
    return f"{_PART_PREFIX}{col}={s}"


class _OpenFile:
    """One parquet file being streamed to: its writer, staging path,
    running row count, and incrementally folded min/max stats."""

    __slots__ = ("writer", "path", "rel", "rows", "stats", "bad_stats")

    def __init__(self, writer, path: str, rel: str):
        self.writer = writer
        self.path = path
        self.rel = rel
        self.rows = 0
        self.stats: dict[str, list] = {}
        self.bad_stats: set[str] = set()


def _fold_stats(state: _OpenFile, batch, stats_cols: list[str]) -> None:
    """Fold one batch's min/max into the file's running stats. Nulls are
    skipped (SQL aggregate semantics); a column whose type pyarrow
    cannot order (nested, binary) is marked unsupported and dropped at
    finalization — a file without stats is never pruned, so this only
    costs skipping, never correctness."""
    import pyarrow.compute as pc

    names = batch.schema.names
    for c in stats_cols:
        if c in state.bad_stats or c not in names:
            continue
        try:
            mm = pc.min_max(batch.column(names.index(c)))
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
        except Exception:
            state.bad_stats.add(c)
            state.stats.pop(c, None)
            continue
        cur = state.stats.setdefault(c, [None, None])
        if mn is not None and (cur[0] is None or mn < cur[0]):
            cur[0] = mn
        if mx is not None and (cur[1] is None or mx > cur[1]):
            cur[1] = mx


def _encode_stats(state: _OpenFile, stats_cols: list[str]) -> dict:
    """The file's stats in manifest form (``{col: [min, max]}``,
    ``_stat_encode`` domain). Tz-aware timestamps are normalized to
    naive UTC first so the ISO encoding compares identically with
    stats the engine's own (UTC-session) pass records. A column the
    file holds no values for records ``[None, None]`` — the all-NULL
    range, which correctly prunes every comparison."""
    import datetime

    from ..plans.snapshots import (
        _STAT_UNSUPPORTED,
        ROWS_STAT_KEY,
        _stat_encode,
    )

    # the row count the task already kept (Delta's numRecords) — free
    out: dict = {ROWS_STAT_KEY: int(state.rows)}
    for c in stats_cols:
        if c in state.bad_stats:
            continue
        mn, mx = state.stats.get(c, [None, None])
        enc = []
        for v in (mn, mx):
            if isinstance(v, datetime.datetime) and v.tzinfo is not None:
                v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
            e = _stat_encode(v)
            if e is _STAT_UNSUPPORTED:
                enc = None
                break
            enc.append(e)
        if enc is not None:
            out[c] = enc
    return out


def _split_batch(batch, pcols: list[str] | None, ptypes: dict[str, str]):
    """Yield ``(part_dir, sub_batch)`` groups of one Arrow batch. The
    unpartitioned path is zero-copy passthrough; partitioned batches
    split by tuple (partition columns are low-cardinality by the table
    contract, so the per-batch python key pass is bounded). A batch
    that is entirely one tuple — the common case after the caller
    repartitions on the partition columns — is passed through whole."""
    if not pcols:
        yield "", batch
        return
    import pyarrow as pa

    names = batch.schema.names
    cols = [batch.column(names.index(c)).to_pylist() for c in pcols]
    groups: dict[tuple, list[int]] = {}
    for i, key in enumerate(zip(*cols)):
        groups.setdefault(key, []).append(i)
    for key, idxs in groups.items():
        part_dir = "/".join(
            _part_segment(c, v, ptypes[c]) for c, v in zip(pcols, key)
        )
        sub = (
            batch
            if len(idxs) == batch.num_rows
            else batch.take(pa.array(idxs, type=pa.int64()))
        )
        yield part_dir, sub


def _write_task(cfg: dict, iterator) -> _FilesMessage:
    """The per-task write loop (batch AND streaming sinks share it):
    stream Arrow batches into per-partition parquet files staged in a
    task-local temp dir, rotating at ``maxRecordsPerFile`` (checked per
    batch — bounded overshoot, like a size-triggered roll), then
    publish each finished file through the storage seam and return the
    metadata the driver's commit needs. File names embed a fresh
    per-attempt uuid, so speculative or retried attempts can never
    collide — a losing attempt's objects are unreferenced residue,
    exactly the crash-safety story of every other commit path."""
    import pyarrow.parquet as pq

    task_uid = uuid.uuid4().hex
    tmpdir = tempfile.mkdtemp(prefix="snapsink-")
    open_files: dict[str, _OpenFile] = {}
    seq: dict[str, int] = {}
    opened = 0  # task-global: every staged file gets a distinct path
    done: list[dict] = []
    stats_cols = cfg["stats_cols"] or []

    def _finish(state: _OpenFile) -> None:
        state.writer.close()
        size = os.path.getsize(state.path)
        cfg["store"].put_file(cfg["root"], state.rel, state.path)
        os.remove(state.path)
        entry = {"rel": state.rel, "size": size}
        if stats_cols:
            entry["stats"] = _encode_stats(state, stats_cols)
        done.append(entry)

    def _open(part_dir: str, schema) -> _OpenFile:
        nonlocal opened
        n = seq.get(part_dir, 0)
        seq[part_dir] = n + 1
        name = f"part-{task_uid}-{n:05d}.parquet"
        rel = f"data/{cfg['commit_name']}/" + (
            f"{part_dir}/{name}" if part_dir else name
        )
        opened += 1
        path = os.path.join(tmpdir, f"stage-{opened}")
        writer = pq.ParquetWriter(path, schema, compression="zstd")
        state = open_files[part_dir] = _OpenFile(writer, path, rel)
        return state

    def _append(part_dir: str, sub) -> None:
        state = open_files.get(part_dir) or _open(part_dir, sub.schema)
        state.writer.write_batch(sub)
        state.rows += sub.num_rows
        if stats_cols:
            _fold_stats(state, sub, stats_cols)
        if cfg["max_records"] and state.rows >= cfg["max_records"]:
            _finish(open_files.pop(part_dir))

    cap = cfg["max_records"]
    try:
        for batch in iterator:
            if batch.num_rows == 0:
                continue
            for part_dir, sub in _split_batch(
                batch, cfg["pcols"], cfg["ptypes"]
            ):
                if not cap:
                    _append(part_dir, sub)
                    continue
                # exact maxRecordsPerFile (Spark's contract): slice the
                # group at each file's remaining capacity — zero-copy
                # Arrow slices, so the cap costs no materialization
                off = 0
                while off < sub.num_rows:
                    state = open_files.get(part_dir)
                    room = cap - (state.rows if state else 0)
                    take = min(room, sub.num_rows - off)
                    _append(part_dir, sub.slice(off, take))
                    off += take
        for state in open_files.values():
            _finish(state)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)
    return _FilesMessage(files=done)


# ---------------------------------------------------------------------------
# driver-side commit (session-free — runs in the DataSource Python worker)
# ---------------------------------------------------------------------------


def _delete_residue(cfg: dict, messages) -> None:
    """Best-effort removal of published-but-uncommitted data objects
    (aborted job, replayed micro-batch): they are unreferenced and
    therefore inert either way — vacuum would sweep them — but deleting
    now keeps garbage from accumulating under hot streaming roots."""
    for msg in messages:
        for f in getattr(msg, "files", None) or []:
            try:
                cfg["store"].delete_key(cfg["root"], f["rel"])
            except OSError:
                pass


def _commit_files(cfg: dict, messages, batch_id: int | None = None) -> int | None:
    """Assemble and publish ONE manifest from the tasks' commit
    messages — the session-free twin of ``snapshot_write``'s commit
    loop: re-read fresh state each attempt, re-check replay ledgers and
    property conflicts, rebase, and publish via the conditional put.
    Returns the committed version, or None when an idempotence ledger
    proves the content is already in the table (the fresh duplicate
    files are deleted as residue)."""
    from ..plans.snapshots import (
        _MAX_COMMIT_RETRIES,
        DEFAULT_STREAM_APP,
        _batch_replayed,
        _commit_backoff,
        _finalize_commit,
        _merge_schemas,
        _parse_partition_values,
        _stream_ledger,
    )
    from pyspark.sql.types import StructType

    store, root, mode = cfg["store"], cfg["root"], cfg["mode"]
    new_files: dict[str, dict] = {}
    for msg in messages:
        for f in getattr(msg, "files", None) or []:
            new_files[f["rel"]] = f
    pcols = cfg["pcols"]
    cols = cfg["stats_cols"]
    for attempt in range(_MAX_COMMIT_RETRIES):
        _commit_backoff(attempt)
        latest = current_version_fast(store, root)
        latest_m = (
            read_manifest(store, root, latest) if latest is not None else None
        )
        if latest_m is not None:
            _refuse_unsupported(latest_m)  # may have raced onto the table
            ensure_writable(latest_m, root)  # unknown writerFeatures gate
        # UPGRADE PATH (r10 ADVICE): a table written by the pre-r10 sink
        # carries a legacy cumulative `batch_ids` list with no app notion
        # — it belonged to that table's ONE stream. When that stream
        # resumes on the same checkpoint under this build, its app id is
        # freshly DERIVED (stream-<md5>), so the scalar ledger has no
        # entry for it and the legacy list would be ignored — letting the
        # engine's re-delivered last batch commit twice. Adopt the legacy
        # list as THIS stream's history when (a) the id was derived, not
        # explicit, (b) the scalar ledger has never seen this app, and
        # (c) the delivered batch id is at-or-past the legacy high-water
        # mark — a resumed stream replays its last batch (== max) or
        # delivers the next (max+1), while a genuinely NEW stream starts
        # at batch 0 (< max whenever the legacy stream committed more
        # than one batch) and must NOT be vetoed by another stream's
        # ledger (r10 self-review finding #2). The fold below lands on
        # this stream's own key, so the adoption is sticky across later
        # restarts. A distinct new stream on a legacy table can always
        # decouple explicitly via streamAppId.
        adopt_legacy = False
        alias_app = None
        if batch_id is not None and cfg.get("stream_app_derived") and latest_m:
            legacy = latest_m.get("batch_ids") or []
            # single-batch ambiguity (r12, advisor): when the legacy
            # table committed EXACTLY one batch (batch_ids == [0]), a
            # resumed legacy stream replaying batch 0 and a genuinely
            # NEW stream delivering ITS batch 0 are indistinguishable.
            # Decline adoption then — the chosen failure mode is a
            # possible duplicate of that one batch (at-least-once),
            # never silently DROPPING a new stream's first batch and
            # deleting its staged files. Pass streamAppId=_stream to
            # resolve the ambiguity explicitly toward replay-veto.
            adopt_legacy = bool(
                legacy
                and cfg["stream_app"] not in latest_m.get("stream_txns", {})
                and int(batch_id) >= max(int(b) for b in legacy)
                and max(int(b) for b in legacy) > 0
            )
            # ledger miss on the CURRENT derived id: the table may have
            # been keyed by an earlier build's normalization of the same
            # checkpoint spelling (r12, advisor) — probe those hashes
            # and, on a hit, treat that entry as this stream's history
            # (folded onto the current key at commit below)
            if cfg["stream_app"] not in latest_m.get("stream_txns", {}):
                for cand in cfg.get("stream_app_aliases") or ():
                    if cand in latest_m.get("stream_txns", {}):
                        alias_app = cand
                        break
        if batch_id is not None and (
            _batch_replayed(latest_m, cfg["stream_app"], int(batch_id))
            or (alias_app is not None
                and _batch_replayed(latest_m, alias_app, int(batch_id)))
            or (adopt_legacy and int(batch_id) in latest_m.get("batch_ids", []))
        ):
            _delete_residue(cfg, messages)
            return None  # replayed micro-batch: already committed
        if cfg["txn_app"] is not None and latest_m is not None:
            rec = latest_m.get("txns", {}).get(cfg["txn_app"])
            if rec is not None and int(cfg["txn_version"]) <= int(rec):
                _delete_residue(cfg, messages)
                return None  # replayed transaction: already committed
        base_files: list[str] = []
        base_stats: dict = {}
        base_batches: list[int] = []
        commit_schema = cfg["schema_json"]
        ac = None
        prev = None
        if latest_m is not None:
            prev = latest_m
            ac = latest_m.get("auto_compact_mb")
            base_batches = latest_m.get("batch_ids", [])
            if mode == "append":
                prev_pby = latest_m.get("partition_by")
                if (prev_pby or None) != (pcols or None):
                    raise IOError(
                        f"snapshot_table writer conflict on {root}: the "
                        f"table's partition columns are {prev_pby} but this "
                        f"append's files were laid out for {pcols} — re-run "
                        "against fresh state"
                    )
                base_files = latest_m["files"]
                base_stats = latest_m.get("stats", {})
                if cols is None:
                    # a concurrent writer may have declared stats after
                    # planning; our files carry none for them (missing
                    # per-file stats only cost pruning, never answers)
                    cols = latest_m.get("stats_cols")
                commit_schema = _merge_schemas(
                    StructType.fromJson(json.loads(latest_m["schema"])),
                    StructType.fromJson(json.loads(cfg["schema_json"])),
                ).json()
                _refuse_tombstoned_readds(  # a drop may have raced in
                    latest_m,
                    StructType.fromJson(json.loads(cfg["schema_json"])).names,
                )
        manifest: dict = {
            "version": (latest or 0) + 1,
            "action": "stream-append" if batch_id is not None else mode,
            "schema": commit_schema,
            # rebased over prev (r12): defers the merged list and lets
            # the shared encoder diff / rebuild columnar, O(batch)
            "files": rebase_files(base_files, list(new_files)),
        }
        if batch_id is not None:
            # scalar HWM ledger (O(1) manifest bytes per commit in stream
            # lifetime); folds any legacy cumulative list and retires it —
            # onto THIS stream's key when it adopted the legacy history
            # (see above), so later restarts keep finding their HWM
            _stream_ledger(
                manifest,
                latest_m,
                cfg["stream_app"],
                int(batch_id),
                fold_app=cfg["stream_app"] if adopt_legacy else DEFAULT_STREAM_APP,
            )
            if alias_app is not None:
                # fold the earlier-normalization key's HWM onto the
                # current key so later restarts (which derive the
                # current id) keep finding their high-water mark; the
                # alias key itself carries via _finalize_commit's
                # prev-merge — ~25 inert bytes, and still correct if
                # the table is ever opened by the older build again
                st = manifest["stream_txns"]
                st[cfg["stream_app"]] = max(
                    int(st[cfg["stream_app"]]),
                    int(latest_m["stream_txns"][alias_app]),
                )
        elif base_batches:
            # batch append on a LEGACY-ledgered table: keep the list until
            # a stream commit folds it into the stream_txns scalar
            manifest["batch_ids"] = base_batches
        if cfg["txn_app"] is not None:
            manifest["txns"] = {cfg["txn_app"]: int(cfg["txn_version"])}
        if mode == "append" and prev is not None and prev.get("dv"):
            manifest["dv"] = prev["dv"]
        if cols:
            manifest["stats_cols"] = list(cols)
            manifest["stats"] = rebase_section(
                base_stats,
                {rel: e.get("stats", {}) for rel, e in new_files.items()},
                frozenset(),
                manifest["files"],
            )
        if pcols:
            manifest["partition_by"] = list(pcols)
            base_parts = (prev or {}).get("partitions", {}) if mode == "append" else {}
            manifest["partitions"] = rebase_section(
                base_parts,
                {
                    rel: _parse_partition_values(rel, pcols)
                    for rel in new_files
                },
                frozenset(),
                manifest["files"],
            )
        if ac:
            manifest["auto_compact_mb"] = float(ac)
        # sizes: fresh files bring theirs from the tasks' own staging
        # stat; live files inherit; pre-upgrade files backfill via the
        # store (same invariant as plans.snapshots._resolve_sizes). A
        # lazy post-upgrade prev keeps the rebased fast path (complete-
        # coverage invariant held at its own commit); a plain-dict prev
        # (tiny JSON / legacy) takes the checked scalar merge.
        prev_sizes = (prev or {}).get("sizes")
        if mode == "append" and isinstance(prev_sizes, LazySection):
            manifest["sizes"] = rebase_section(
                prev_sizes,
                {rel: int(e["size"]) for rel, e in new_files.items()},
                frozenset(),
                manifest["files"],
            )
        else:
            live = set(manifest["files"])
            sizes = {
                f: s
                for f, s in {
                    **(dict(prev_sizes) if prev_sizes else {}),
                    **{rel: e["size"] for rel, e in new_files.items()},
                }.items()
                if f in live
            }
            for f in sorted(live - set(sizes)):
                sizes[f] = int(store.key_size(root, f))
            manifest["sizes"] = sizes
        payload = _finalize_commit(manifest, prev)
        version = int(manifest["version"])
        if store.put_if_absent_bytes(
            root, f"{SNAP_DIR}/{manifest_name(version)}", payload
        ):
            store.write_pointer(root, version)
            return version
    raise IOError(
        f"snapshot_table writer: lost the commit race "
        f"{_MAX_COMMIT_RETRIES} times on {root} — a runaway committer "
        "is monopolizing the table"
    )


# ---------------------------------------------------------------------------
# the DataSource writer classes
# ---------------------------------------------------------------------------


class SnapshotTableWriter(DataSourceArrowWriter):
    """Batch half: ``df.write.format("snapshot_table")`` with
    ``mode("append")`` or ``mode("overwrite")``. Options: ``root``
    (required), ``partitionBy`` (comma list, else inherited),
    ``stats`` (comma list, else inherited on append),
    ``maxRecordsPerFile``, ``txnAppId``/``txnVersion`` (idempotent
    batch retry, Delta's SetTransaction)."""

    def __init__(self, schema, options, overwrite: bool):
        self._cfg = _plan_write(schema, options, overwrite, streaming=False)

    def write(self, iterator):
        return _write_task(self._cfg, iterator)

    def commit(self, messages):
        _commit_files(self._cfg, messages)

    def abort(self, messages):
        _delete_residue(self._cfg, messages)


class SnapshotTableStreamWriter(DataSourceStreamArrowWriter):
    """Streaming half: a native ``writeStream.format("snapshot_table")``
    sink (append output mode). Each micro-batch commits one manifest
    version recording its ``batchId`` in the cumulative ledger, so a
    re-delivered batch (engine replay after a crash between sink commit
    and checkpoint advance) is detected from one manifest read and
    skipped — table content converges to exactly-once, the same
    contract the engine's foreachBatch ``snapshot_write(batch_id=...)``
    path has always offered, now without leaving the DataFrame API."""

    def __init__(self, schema, options, overwrite: bool):
        self._cfg = _plan_write(schema, options, overwrite, streaming=True)

    def write(self, iterator):
        return _write_task(self._cfg, iterator)

    def commit(self, messages, batchId):
        _commit_files(self._cfg, messages, batch_id=int(batchId))

    def abort(self, messages, batchId):
        _delete_residue(self._cfg, messages)
