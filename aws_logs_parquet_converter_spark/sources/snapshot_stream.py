"""Snapshot-manifest tables as a STRUCTURED STREAMING SOURCE (and, via
``sources/snapshot_sink.py``, as a batch-writer target and a native
streaming SINK — all four halves of the DataSource registered here).

``spark.readStream.format("snapshot_table").option("root", ...)`` turns a
versioned table (plans/snapshots.py) into a stream of its appended rows —
the "table as a stream" half of the Delta design (Armbrust et al.,
VLDB'20 §4.3: a streaming source whose offsets are log positions), built
on the Spark 4 Python DataSource API:

* **Offsets are version numbers** (plus an optional sub-version
  ``index`` under rate limiting). ``latestOffset`` reads the advisory
  ``_snapshots/_latest`` tip pointer (O(1) metadata + a bounded forward
  reconcile — Delta's ``_last_checkpoint`` protocol; a missing pointer
  falls back to the directory LIST); a micro-batch covers
  the versions committed since the last checkpointed offset. Replay of a
  batch re-reads the same version range — deterministic by manifest
  immutability, so the engine's own checkpoint gives exactly-once into
  any idempotent sink. This composes with the OTHER direction
  (streaming/events.py writes micro-batches AS manifest versions): two
  tables chained through a snapshot table form an end-to-end
  exactly-once pipeline.
* **Rate-limited admission** (Delta's ``maxFilesPerTrigger`` /
  ``maxBytesPerTrigger``): with either option set, ``latestOffset``
  advances by at most that many delta files / manifest-recorded bytes
  per micro-batch (always at least one file), splitting WITHIN a
  version when needed — the offset gains an ``index`` naming how many
  of the version's (deterministically sorted) delta units are consumed,
  Delta's DeltaSourceOffset shape. Byte accounting reads the manifests'
  per-file ``sizes`` (pure metadata, no stat calls); a stream catching
  up on a 100 TB backlog takes it in governed slices whose size the
  cluster chooses, instead of one unbounded first batch. Restart
  recovery rides the engine's replay of the offset log's last batch
  (the call-order contract PySpark's own simple-reader wrapper depends
  on), so the first post-restart batch is bounded too. With
  ``Trigger.AvailableNow``/``Once`` the engine captures ONE admission
  per run (the wrapper polls once); steady backpressure wants a
  processing-time trigger.
* **A batch plans one task per DELTA FILE.** ``partitions`` walks the
  manifests in the offset range exactly like
  ``plans.snapshots.snapshot_changes`` — append-lineage commits
  contribute ``files(v) − files(v-1)``; an OPTIMIZE rewrites bytes but
  no rows and contributes NOTHING (maintenance stays invisible to
  consumers); rewrite actions (``overwrite``/``merge``) raise the same
  re-baseline error. Executors read their file with pyarrow and yield
  Arrow RECORD BATCHES (the API's vectorized path — no per-row Python).
* **Schema** comes from the newest manifest; files predating an added
  column are reconciled executor-side (missing columns yield NULL), the
  same contract as ``snapshot_read``.

Storage access goes through the SHARED storage seam
(``aws_logs_parquet_converter_spark.storage``): the driver-side offset
tracker and executor-side readers run outside the JVM, so Hadoop FS
isn't reachable — ``storage_for_root`` picks ``LocalSnapshotStorage``
for plain paths and ``FsspecSnapshotStorage`` for scheme-qualified URIs
(``s3://…`` once fsspec + the scheme driver are installed). Manifest
parsing (delta-chain resolution included) is the SAME code the JVM
planner uses (``storage.read_manifest``), so the two readers cannot
drift.
"""

from __future__ import annotations

import json

from ..storage import (
    SnapshotStorage,
    read_manifest as _seam_read_manifest,
    storage_for_root,
)

__all__ = ["SnapshotTableStreamSource", "register_snapshot_stream_source"]


def _read_manifest_py(storage: SnapshotStorage, root: str, version: int) -> dict:
    """RESOLVED manifest of ``version`` via the shared seam reader —
    full manifests load directly; delta-encoded ones (the log-segment
    form) walk back to their checkpoint and materialize. One resolver,
    shared with plans.snapshots."""
    return _seam_read_manifest(storage, root, version)


class RewriteInRange(ValueError):
    """A rewrite-action commit (overwrite/merge/delete/restore/update)
    inside an append-lineage version range: its delta is not
    expressible as appended files. Carries ``version``/``action`` so
    batch-side callers (``snapshot_changes``) can re-raise with their
    own re-baseline advice; stream callers see the ValueError text."""

    def __init__(self, version: int, action: str, msg: str):
        super().__init__(msg)
        self.version = version
        self.action = action


def _iter_version_deltas(
    storage: SnapshotStorage,
    root: str,
    baseline_v: int,
    first_v: int,
    end_v: int,
):
    """Yield ``(version, fresh_files_sorted, manifest-view)`` for every
    version in ``[first_v, end_v]`` against the ``baseline_v`` snapshot —
    the snapshot_changes walk as a GENERATOR so callers can stop early
    (rate-limited admission walks only as far as the limit reaches) or
    slice a version's file list (sub-version offsets). Optimize commits
    yield an EMPTY fresh list (maintenance is invisible to consumers);
    rewrite actions raise the re-baseline error. The per-version order
    is ``sorted`` — deterministic, so a ``(version, index)`` offset
    names the same file set on every replay.

    COST: O(fresh files) per version, NOT O(live files). Delta-encoded
    manifests (the steady-state on-disk form) record ``adds`` —
    byte-identical to ``sorted(files(v) - files(v-1))`` — plus the adds'
    own ``sizes_adds``/``stats_adds``/``partitions_adds``, so the walk
    reads raw commit JSONs without EVER materializing a full file list;
    only a FULL-form manifest in range (a checkpoint every
    MANIFEST_CHECKPOINT_EVERY versions, or a rewrite-shaped commit)
    pays one predecessor resolution to rebuild the running set. Without
    this, every micro-batch poll on a 100k-file table would decode the
    whole manifest to plan an 8-file batch (measured growing in
    tools/rate_limit_probe.py; flat after).

    The yielded manifest-view carries ``schema``/``column_mapping``
    plus ``sizes``/``stats``/``partitions`` covering AT LEAST the fresh
    files — everything admission and planning read per file.
    (``baseline_v`` is implied by ``first_v`` here — the raw walk
    resolves a predecessor lazily; the parameter stays for signature
    parity with the CDF twin.)"""
    from ..storage import read_raw_manifest

    if read_raw_manifest(storage, root, end_v).get("column_mapping"):
        # mirror plans.snapshots._require_unmapped: files store PHYSICAL
        # names — planning them under logical names would read NULLs
        raise ValueError(
            "the snapshot DataSource does not support column-mapped tables "
            "(a column was renamed via snapshot_rename_column); rewrite "
            "the table (mode='overwrite') to materialize the rename"
        )
    seen: set[str] | None = None  # lazily materialized full file set
    from ..storage import ensure_readable

    for v in range(first_v, end_v + 1):
        raw = read_raw_manifest(storage, root, v)
        # the raw walk bypasses the resolver, so the readerFeatures
        # gate applies here too — an unknown feature must error, not
        # stream wrong rows
        ensure_readable(raw, root)
        action = raw.get("action", "append")
        if action in ("overwrite", "merge", "delete", "restore", "update"):
            raise RewriteInRange(
                v,
                action,
                f"snapshot stream hit a {action!r} commit at version {v} — "
                "rows were rewritten; restart the stream from a fresh "
                "baseline (startingVersion)",
            )
        if "files" not in raw:
            # DELTA form: base is always v-1, so `adds` IS the fresh
            # set in the walk's own order; the running set only needs
            # updating if a full-form version already materialized it
            adds = raw.get("adds", [])
            if seen is not None:  # in place: O(changes), not O(live)
                seen.difference_update(raw.get("removes", ()))
                seen.update(adds)
            view = {
                "version": v,
                "action": action,
                "schema": raw["schema"],
                "sizes": raw.get("sizes_adds", {}),
                "stats": raw.get("stats_adds", {}),
                "partitions": raw.get("partitions_adds", {}),
            }
            for k in ("column_mapping", "stats_cols", "partition_by"):
                if raw.get(k):
                    view[k] = raw[k]
            yield v, ([] if action == "optimize" else list(adds)), view
            continue
        # FULL form (checkpoint / rewrite-shaped): raw IS the complete
        # manifest; rebuild the running set from the predecessor once
        files = set(raw["files"])
        if action == "optimize":
            seen = files
            yield v, [], raw
            continue
        if seen is None:
            seen = (
                set(_read_manifest_py(storage, root, v - 1)["files"])
                if v - 1 > 0
                else set()
            )
        fresh = sorted(files - seen)
        seen = files
        yield v, fresh, raw


def _delta_files(
    storage: SnapshotStorage, root: str, start_v: int, end_v: int
) -> tuple[list[str], str, dict]:
    """(delta file list, schema JSON of the range's newest manifest,
    per-file stats for the delta files) — the snapshot_changes walk,
    shared by partition planning. Stats come from the manifest that
    introduced each file (the commit-time min/max the writer gathered)."""
    from ..plans.snapshots import _effective_stats, _phys_types

    delta: list[str] = []
    stats: dict[str, dict] = {}
    schema_json = None
    for v, fresh, m in _iter_version_deltas(
        storage, root, start_v, start_v + 1, end_v
    ):
        schema_json = m["schema"]
        delta.extend(fresh)
        # one lookup serves min/max stats AND first-class partition
        # values (exact [v, v] ranges) — the same fold every batch-side
        # pruning site uses, so a partition-column filter skips streamed
        # files too, not just rows
        types = _phys_types(m)
        for f in fresh:
            eff = _effective_stats(m, f, types)
            if eff:
                stats[f] = eff
    if schema_json is None:
        schema_json = _read_manifest_py(storage, root, end_v)["schema"]
    return delta, schema_json, stats


#: the prune ops, as pyarrow.compute functions — same surface as
#: plans.snapshots._PRED_BUILDERS
_PC_OPS = ("=", "<", "<=", ">", ">=")


def _survives(stats: dict | None, col: str, op: str, val) -> bool:
    """Driver-side file pruning — plans.snapshots._file_survives with
    JSON-native stats (kept JVM-free so the source has no Spark-session
    dependency at planning time)."""
    if not stats or col not in stats:
        return True
    mn, mx = stats[col]
    if mn is None or mx is None:
        return False  # all-NULL file: no comparison can be true
    if op == "=":
        return mn <= val <= mx
    if op == "<":
        return mn < val
    if op == "<=":
        return mn <= val
    if op == ">":
        return mx > val
    if op == ">=":
        return mx >= val
    raise ValueError(f"unsupported prune op {op!r} ({', '.join(_PC_OPS)})")


def _resolve_version_py(storage: SnapshotStorage, root: str, options) -> int:
    """The version a batch read addresses: explicit ``version`` option,
    else ``timestamp`` (epoch seconds — newest version whose IN-COMMIT
    ``committed_at`` stamp is at-or-before it, the TIMESTAMP AS OF rule
    of plans.snapshots.snapshot_version_as_of; file mtime only for
    pre-stamp manifests), else latest. The latest/explicit paths cost
    O(1) metadata (the ``_latest`` tip pointer / one existence probe) —
    only timestamp resolution pays a directory LIST (it needs the
    surviving-version set)."""
    if options.get("version") is not None:
        v = int(options["version"])
        if not storage.manifest_exists(root, v):
            raise FileNotFoundError(f"snapshot table {root} has no version {v}")
        return v
    if options.get("timestamp") is not None:
        from ..storage import version_at_or_before

        vs = storage.list_versions(root)
        if not vs:
            raise FileNotFoundError(f"snapshot table {root} has no commits")
        ts = float(options["timestamp"])
        best = version_at_or_before(storage, root, ts, versions=vs)
        if best is None:
            raise ValueError(
                f"snapshot table {root} has no version committed at or "
                f"before {ts}"
            )
        return best
    from ..storage import current_version_fast

    tip = current_version_fast(storage, root)
    if tip is None:
        raise FileNotFoundError(f"snapshot table {root} has no commits")
    return tip


_BYTE_SUFFIX = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def _parse_byte_size(raw: str) -> int:
    """``maxBytesPerTrigger`` values: a plain integer byte count or a
    ``k``/``m``/``g``/``t``-suffixed size (``"128m"``)."""
    s = str(raw).strip().lower().removesuffix("b")
    if s and s[-1] in _BYTE_SUFFIX:
        return int(float(s[:-1]) * _BYTE_SUFFIX[s[-1]])
    return int(s)


def _norm_off(off: dict) -> tuple[int, int | None]:
    """``(version, index)`` of an offset dict — ``index`` is the number
    of the version's delta units (files; change specs in CDF mode)
    already consumed, or None when the version is wholly consumed (the
    pre-rate-limit offset shape, so old checkpoints keep resolving)."""
    idx = off.get("index")
    return int(off["version"]), (int(idx) if idx is not None else None)


def _parse_filters(options) -> list[tuple]:
    out: list[tuple] = []
    raw = options.get("filters")
    if raw:
        for c, op, v in json.loads(raw):
            if op not in _PC_OPS:
                raise ValueError(
                    f"unsupported filter op {op!r} ({', '.join(_PC_OPS)})"
                )
            out.append((c, op, v))
    return out


try:  # pyspark >= 4.0 only
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _SnapshotFilePartition(InputPartition):
        """One data file of a micro-batch / batch read. Deletion-vector
        state ships as the vector PARQUET PATHS plus this file's key in
        the vector space — each task reads its own positions
        executor-side, so planning cost is O(#touched files) driver
        metadata, never O(#deleted rows) (a GDPR-scale vector embedded
        in the serialized partition could OOM the driver)."""

        def __init__(
            self,
            entry: str,
            rel_key: str | None = None,
            dv_paths: tuple = (),
            mode: str = "subtract",
            change: str | None = None,
            version: int | None = None,
        ):
            #: manifest file entry (root-relative, or clone-absolute)
            self.entry = entry
            #: this file's ``data/<commit>/<part>`` key in vector space
            self.rel_key = rel_key
            #: deletion-vector parquet paths (manifest entries) whose
            #: positions apply to this partition
            self.dv_paths = dv_paths
            #: ``subtract`` = mask the named rows out (batch read of a
            #: dv-carrying version); ``select`` = emit ONLY the named
            #: rows (change-feed delete/update_preimage halves)
            self.mode = mode
            self.change = change
            self.version = version

    def _dv_touched_files(storage, root, dv_paths) -> set:
        """Rel keys of the data files the named deletion-vector parquets
        touch — DRIVER-side planning metadata. Streams the ``file``
        column one record batch at a time and keeps only distinct
        values: O(#touched files) memory, the positions never leave the
        executor-side read path."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        touched: set = set()
        for p in dv_paths:
            pf = pq.ParquetFile(storage.open_data_file(root, p))
            for b in pf.iter_batches(columns=["file"]):
                touched.update(pc.unique(b.column("file")).to_pylist())
        return touched

    def _dv_positions(storage, root, dv_paths, rel_key):
        """THIS file's deleted row indexes from the named vector
        parquets — runs EXECUTOR-side inside the task that reads the
        file, the same place plans.snapshots._plan_scan applies its
        vector anti-join. The ``file == rel_key`` predicate is pushed
        INTO the parquet read (row-group statistics filter): the writer
        sorts vectors by ``(file, pos)`` (plans.snapshots._delete_dv),
        so each task decodes only the row groups covering its own file
        instead of rescanning the whole vector set — a wide delete
        touching N files costs ~O(dv_bytes) total, not O(N × dv_bytes)
        (r7 ADVICE)."""
        import numpy as np
        import pyarrow.parquet as pq

        out: list[int] = []
        for p in dv_paths:
            t = pq.read_table(
                storage.open_data_file(root, p),
                columns=["pos"],
                filters=[("file", "==", rel_key)],
            )
            out.extend(t.column("pos").to_pylist())
        return np.asarray(sorted(out), dtype=np.int64)

    def _arrow_widens(frm, to) -> bool:
        """Is ``frm -> to`` a LEGAL lossless widening at the Arrow
        level — the read-side mirror of plans.snapshots._WIDENINGS?
        Casting in this direction is exact; anything else must raise,
        not narrow."""
        import pyarrow as pa

        ints = {
            pa.int8(): 0,
            pa.int16(): 1,
            pa.int32(): 2,
            pa.int64(): 3,
        }
        if frm in ints:
            if to in ints:
                return ints[frm] <= ints[to]
            return to == pa.float64()
        if frm == pa.float32() and to == pa.float64():
            return True
        if pa.types.is_decimal(frm) and pa.types.is_decimal(to):
            return to.scale == frm.scale and to.precision >= frm.precision
        return False

    def _iter_file_batches(source, fields, filters, deleted=(), selected=None):
        """One parquet file -> Arrow record batches: columns reconciled
        to the DECLARED schema (files predating an added column yield
        typed NULLs — the snapshot_read contract), deletion-vector row
        indexes masked out, residual filters applied with SQL WHERE
        semantics (NULL predicate -> dropped). Shared by the batch and
        streaming readers; runs executor-side, vectorized end-to-end."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type

        pc_ops = {
            "=": pc.equal,
            "<": pc.less,
            "<=": pc.less_equal,
            ">": pc.greater,
            ">=": pc.greater_equal,
        }
        dead = np.asarray(deleted, dtype=np.int64)
        sel = (
            np.asarray(selected, dtype=np.int64) if selected is not None else None
        )
        pf = pq.ParquetFile(source)
        have = set(pf.schema_arrow.names)
        cols_present = [f.name for f in fields if f.name in have]
        offset = 0
        for batch in pf.iter_batches(columns=cols_present):
            n = batch.num_rows
            cols = []
            for f in fields:
                if f.name in have:
                    col = batch.column(f.name)
                    want = to_arrow_type(f.dataType)
                    if col.type != want:
                        if not _arrow_widens(col.type, want):
                            # the file is WIDER than (or incompatible
                            # with) the declared type: a type-widening
                            # commit landed after this stream captured
                            # its schema. Narrowing silently would be
                            # wrong and casting can overflow — fail with
                            # the restart instruction (Delta's rule for
                            # non-additive schema changes mid-stream)
                            raise ValueError(
                                f"column {f.name!r} stores {col.type} but "
                                f"this reader's schema declares {want} — "
                                "the table's schema was widened or retyped "
                                "after this stream/reader captured its "
                                "schema; restart the query to adopt the "
                                "current schema"
                            )
                        # pre-widening file: stored narrow (int32 under
                        # a long column, float under double, ...) —
                        # upcast to the declared type, the Arrow twin of
                        # the JVM reader's native schema resolution
                        col = pc.cast(col, want)
                    cols.append(col)
                else:  # pre-evolution file: typed NULL column
                    cols.append(pa.nulls(n, type=to_arrow_type(f.dataType)))
            out = pa.RecordBatch.from_arrays(
                cols, names=[f.name for f in fields]
            )
            if sel is not None:
                local = sel[(sel >= offset) & (sel < offset + n)] - offset
                keep = np.zeros(n, dtype=bool)
                keep[local] = True
                out = out.filter(pa.array(keep))
            elif dead.size:
                local = dead[(dead >= offset) & (dead < offset + n)] - offset
                if local.size:
                    keep = np.ones(n, dtype=bool)
                    keep[local] = False
                    out = out.filter(pa.array(keep))
            offset += n
            for c, op, v in filters:
                mask = pc_ops[op](out.column(c), pa.scalar(v))
                out = out.filter(pc.coalesce(mask, pa.scalar(False)))
            yield out

    def _iter_cdf_version_specs(
        storage, root: str, baseline_v: int, first_v: int, end_v: int
    ):
        """Yield ``(version, UNFILTERED spec list, manifest-view)`` for
        every version in ``[first_v, end_v]`` — the change-feed analogue
        of :func:`_iter_version_deltas`. Append-lineage commits emit
        their fresh files as ``insert``; a dv delete emits the rows its
        NEW vectors name (``delete``) — the driver reads only the
        vectors' ``file`` column to learn WHICH files are touched
        (O(#touched files) metadata) and each task reads its own
        positions executor-side; a dv update emits both halves
        (``update_preimage`` from the vector, ``update_postimage`` from
        its fresh files). An OPTIMIZE rewrites bytes but no rows and
        contributes an EMPTY list (Delta's readChangeFeed rule:
        maintenance is invisible to change consumers). Commits without
        row lineage raise the re-baseline error.

        COST mirrors the append walk: raw delta manifests serve
        append-lineage versions directly (``adds`` IS the insert set;
        empty adds+removes IS the dv-delete file-stability proof), so a
        rate-limited CDF poll over an append-dominated history reads
        O(admitted) metadata. Only dv versions (which plan row-level
        vector work anyway) and full-form manifests pay a resolution.

        Specs are yielded UNFILTERED and in a deterministic per-version
        order (dv preimages sorted by rel key, then fresh files sorted),
        so a ``(version, index)`` rate-limit offset names the same spec
        set on every replay and stays valid if the consumer's
        ``filters`` option changes across a restart — pruning is the
        caller's second pass."""
        from ..plans.snapshots import _rel_key
        from ..storage import ensure_readable, read_raw_manifest

        if read_raw_manifest(storage, root, end_v).get("column_mapping"):
            raise ValueError(
                "the snapshot change feed does not support column-mapped "
                "tables (a column was renamed via snapshot_rename_column)"
            )
        #: lazily materialized running sets; dv lists ride every raw
        #: form whole (dv is not delta-encoded), so only FILE sets cost
        seen_files: set | None = None
        seen_dv: set | None = None

        def _raise_rebaseline(action, v):
            raise ValueError(
                f"snapshot change feed hit a {action!r} commit at "
                f"version {v} without row-level lineage; restart the "
                "stream from a fresh baseline (startingVersion)"
            )

        for v in range(first_v, end_v + 1):
            raw = read_raw_manifest(storage, root, v)
            ensure_readable(raw, root)
            action = raw.get("action", "append")
            if action in ("overwrite", "merge", "restore"):
                _raise_rebaseline(action, v)
            delta_form = "files" not in raw
            if action in ("delete", "update"):
                # dv versions plan row-level vector work: one resolution
                # is proportionate (and the stability checks need sets)
                m = _read_manifest_py(storage, root, v)
                files, dv = set(m["files"]), set(m.get("dv", ()))
                if seen_files is None:
                    seen_files = (
                        set(_read_manifest_py(storage, root, v - 1)["files"])
                        if v - 1 > 0
                        else set()
                    )
                if seen_dv is None:
                    seen_dv = (
                        set(
                            read_raw_manifest(storage, root, v - 1).get(
                                "dv", ()
                            )
                        )
                        if v - 1 > 0
                        else set()
                    )
                is_dv_delete = (
                    action == "delete" and files == seen_files and dv > seen_dv
                )
                is_dv_update = (
                    action == "update" and files >= seen_files and dv > seen_dv
                )
                if (action == "delete" and not is_dv_delete) or (
                    action == "update" and not is_dv_update
                ):
                    _raise_rebaseline(action, v)
                specs: list[_SnapshotFilePartition] = []
                tag = "update_preimage" if is_dv_update else "delete"
                fresh_dv = tuple(sorted(dv - seen_dv))
                by_rel = {_rel_key(f): f for f in files}
                for relk in sorted(
                    _dv_touched_files(storage, root, fresh_dv)
                ):
                    specs.append(
                        _SnapshotFilePartition(
                            by_rel.get(relk, relk),
                            rel_key=relk,
                            dv_paths=fresh_dv,
                            mode="select",
                            change=tag,
                            version=v,
                        )
                    )
                if is_dv_update:
                    for f in sorted(files - seen_files):
                        specs.append(
                            _SnapshotFilePartition(
                                f, change="update_postimage", version=v
                            )
                        )
                seen_files, seen_dv = files, dv
                yield v, specs, m
                continue
            if delta_form:
                adds = raw.get("adds", [])
                if seen_files is not None:  # in place: O(changes)
                    seen_files.difference_update(raw.get("removes", ()))
                    seen_files.update(adds)
                seen_dv = set(raw.get("dv", ()))
                view = {
                    "version": v,
                    "action": action,
                    "schema": raw["schema"],
                    "sizes": raw.get("sizes_adds", {}),
                    "stats": raw.get("stats_adds", {}),
                    "partitions": raw.get("partitions_adds", {}),
                }
                for k in ("column_mapping", "stats_cols", "partition_by"):
                    if raw.get(k):
                        view[k] = raw[k]
                if action == "optimize":
                    yield v, [], view
                    continue
                yield v, [
                    _SnapshotFilePartition(f, change="insert", version=v)
                    for f in adds  # encoder order == sorted fresh order
                ], view
                continue
            # FULL form (checkpoint / rewrite-shaped)
            files = set(raw["files"])
            if action == "optimize":
                seen_files = files
                seen_dv = set(raw.get("dv", ()))
                yield v, [], raw
                continue
            if seen_files is None:
                seen_files = (
                    set(_read_manifest_py(storage, root, v - 1)["files"])
                    if v - 1 > 0
                    else set()
                )
            fresh = sorted(files - seen_files)
            seen_files = files
            seen_dv = set(raw.get("dv", ()))
            yield v, [
                _SnapshotFilePartition(f, change="insert", version=v)
                for f in fresh
            ], raw

    def _filter_cdf_specs(specs, m, filters):
        """Second-pass pruning of a version's (possibly sliced) spec
        list under the reader's ``filters`` option: a change file whose
        manifest min/max stats or recorded partition values prove no row
        can match is never planned as a partition — a filtered
        changefeed consumer of a partitioned 100 TB table opens only its
        partitions' insert/delete images (rows are still filtered
        batch-side, so the option stays exact without stats)."""
        if not filters:
            return list(specs)
        from ..plans.snapshots import _effective_stats, _phys_types

        types = _phys_types(m)
        out = []
        for s in specs:
            eff = _effective_stats(m, s.entry, types)
            if all(_survives(eff, c, op, v) for c, op, v in filters):
                out.append(s)
        return out

    def _cdf_partition_specs(
        storage, root: str, start_v: int, end_v: int, filters: list = ()
    ) -> list["_SnapshotFilePartition"]:
        """Driver-side plan of a CHANGE-FEED micro-batch — the streaming
        analogue of plans.snapshots.snapshot_cdf: one partition per
        (file, change_type) in the version range (see
        :func:`_iter_cdf_version_specs` for the per-action rules),
        pruned under the reader's ``filters`` option."""
        specs: list[_SnapshotFilePartition] = []
        for _v, vspecs, m in _iter_cdf_version_specs(
            storage, root, start_v, start_v + 1, end_v
        ):
            specs.extend(_filter_cdf_specs(vspecs, m, filters))
        return specs

    class _SnapshotBatchReader(DataSourceReader):
        """``spark.read.format("snapshot_table")`` — the BATCH half of
        the source: one task per data file of the addressed version
        (``version`` / ``timestamp`` / latest), manifest-stats file
        pruning for the ``filters`` option, and deletion-vector
        subtraction planned per file. Planning ships only vector PATHS
        plus the set of touched file names across the driver
        (O(#touched files) metadata — ``_dv_touched_files``); each task
        reads its OWN deleted positions executor-side
        (``_dv_positions``, file-key pushdown into the vector parquets),
        so a dv-carrying version reads correctly through the plain
        reader API without O(#deleted rows) ever landing on the
        driver."""

        def __init__(self, schema, options):
            self._schema = schema
            self._root = options.get("root")
            if not self._root:
                raise ValueError("snapshot_table source requires option 'root'")
            if str(options.get("changefeed", "")).lower() in ("true", "1"):
                # without this guard the batch path would silently return
                # the current snapshot with all-NULL change columns
                raise ValueError(
                    "changefeed is a STREAMING option (spark.readStream); "
                    "for a batch change feed use plans.snapshots.snapshot_cdf"
                )
            self._storage = storage_for_root(self._root)
            self._version = _resolve_version_py(
                self._storage, self._root, options
            )
            self._filters = _parse_filters(options)

        def partitions(self):
            m = _read_manifest_py(self._storage, self._root, self._version)
            if m.get("column_mapping"):
                raise ValueError(
                    "the snapshot DataSource does not support column-mapped "
                    "tables (a column was renamed via snapshot_rename_column)"
                    "; use snapshot_read, which applies the mapping"
                )
            files = m["files"]
            if self._filters:
                # min/max stats AND first-class partition values prune —
                # _effective_stats folds recorded partition tuples into
                # exact [v, v] ranges (driver-side planning, zero IO)
                from ..plans.snapshots import _effective_stats, _phys_types

                types = _phys_types(m)
                # one _effective_stats fold per FILE, not per (file,
                # filter) pair — the dict merge is driver-side work that
                # multiplies across large manifests
                survivors = []
                for f in files:
                    eff = _effective_stats(m, f, types)
                    if all(
                        _survives(eff, c, op, v) for c, op, v in self._filters
                    ):
                        survivors.append(f)
                files = survivors
            dv_paths = tuple(m.get("dv", ()))
            touched: set = set()
            if dv_paths:
                # only the vectors' `file` column crosses the driver —
                # O(#touched files) metadata; positions are read by the
                # task that owns the file
                touched = _dv_touched_files(self._storage, self._root, dv_paths)
            from ..plans.snapshots import _rel_key

            return [
                _SnapshotFilePartition(
                    f,
                    rel_key=_rel_key(f),
                    dv_paths=dv_paths if _rel_key(f) in touched else (),
                )
                for f in files
            ]

        def read(self, partition: "_SnapshotFilePartition"):
            deleted = ()
            if partition.dv_paths:
                deleted = _dv_positions(
                    self._storage,
                    self._root,
                    partition.dv_paths,
                    partition.rel_key,
                )
            yield from _iter_file_batches(
                self._storage.open_data_file(self._root, partition.entry),
                list(self._schema.fields),
                self._filters,
                deleted,
            )

    class _SnapshotStreamReader(DataSourceStreamReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._root = options.get("root")
            if not self._root:
                raise ValueError("snapshot_table source requires option 'root'")
            self._storage = storage_for_root(self._root)
            self._start = int(options.get("startingversion", "0"))
            sts = options.get("startingtimestamp")
            if sts is not None:
                # Delta's startingTimestamp: stream commits at-or-after
                # the instant — the baseline is the newest version
                # committed strictly BEFORE it (in-commit committed_at
                # stamps are the commit clock, as in batch TIMESTAMP AS
                # OF — survives table copies where mtimes do not)
                if options.get("startingversion") is not None:
                    raise ValueError(
                        "pass startingVersion or startingTimestamp, not both"
                    )
                from ..storage import version_at_or_before

                ts = float(sts)
                base = version_at_or_before(
                    self._storage, self._root, ts, strict=True
                )
                if base is not None and base > self._start:
                    self._start = base
            # CHANGE-FEED mode (Delta's streaming readChangeFeed): emit
            # row-level insert / delete / update_preimage /
            # update_postimage changes per version instead of appends
            # only; the schema carries (_change_type, _commit_version)
            self._cdf = str(options.get("changefeed", "")).lower() in (
                "true",
                "1",
            )
            # predicate PUSHDOWN into the source: option 'filters' is a
            # JSON list of [col, op, value] AND-ed terms. Files whose
            # manifest stats prove no row can match are never planned as
            # partitions (the streaming analogue of snapshot_read's data
            # skipping), and surviving files are filtered BATCH-side with
            # pyarrow.compute, so the option is exact on its own — a
            # filtered consumer of a 100 TB table streams only the bytes
            # its predicate touches.
            self._filters: list[tuple] = []
            raw = options.get("filters")
            if raw:
                for c, op, v in json.loads(raw):
                    if op not in _PC_OPS:
                        raise ValueError(
                            f"unsupported filter op {op!r} "
                            f"({', '.join(_PC_OPS)})"
                        )
                    self._filters.append((c, op, v))
            # RATE-LIMITED ADMISSION (Delta's maxFilesPerTrigger /
            # maxBytesPerTrigger): bound what each micro-batch admits so
            # a stream catching up on a 100 TB backlog takes it in
            # governed slices instead of one unbounded batch. Offsets
            # gain a sub-version ``index`` (units of a version already
            # consumed — Delta's DeltaSourceOffset reservoir index);
            # byte accounting is PURE METADATA via the manifests'
            # recorded per-file ``sizes``.
            self._max_files: int | None = None
            self._max_bytes: int | None = None
            raw = options.get("maxfilespertrigger")
            if raw is not None:
                self._max_files = int(raw)
                if self._max_files <= 0:
                    raise ValueError("maxFilesPerTrigger must be positive")
            raw = options.get("maxbytespertrigger")
            if raw is not None:
                self._max_bytes = _parse_byte_size(raw)
                if self._max_bytes <= 0:
                    raise ValueError("maxBytesPerTrigger must be positive")
            # the reader's own position — the end offset of the newest
            # batch it has planned or admitted. Recovery across restarts
            # rides the engine's contract of REPLANNING the offset log's
            # last batch before the first poll (``partitions`` sees the
            # checkpointed end offset and records it; PySpark's own
            # _SimpleStreamReaderWrapper relies on the same call order),
            # so a restarted rate-limited stream resumes bounded from
            # the checkpoint, never unbounded.
            self._pos: dict | None = None

        def initialOffset(self):
            if self._pos is None:
                self._pos = {"version": self._start}
            return {"version": self._start}

        def _iter_units(self, baseline_v: int, first_v: int, end_v: int):
            """(version, deterministic per-version unit list, manifest)
            — units are change SPECS in CDF mode, file entries otherwise;
            the shared walk behind admission and planning."""
            if self._cdf:
                yield from _iter_cdf_version_specs(
                    self._storage, self._root, baseline_v, first_v, end_v
                )
            else:
                yield from _iter_version_deltas(
                    self._storage, self._root, baseline_v, first_v, end_v
                )

        def latestOffset(self):
            # O(1) per poll via the _latest tip pointer (+ bounded
            # forward reconcile) — a micro-batch poll loop on a
            # 100k-commit table no longer pays a full directory LIST
            # every trigger
            from ..storage import current_version_fast

            tip = current_version_fast(self._storage, self._root)
            if tip is None:
                return {"version": self._start}
            if self._max_files is None and self._max_bytes is None:
                self._pos = {"version": tip}
                return self._pos
            if self._pos is None:
                # first poll of a FRESH query (the engine polls before
                # initialOffset); a restart never lands here — the
                # replanned last batch set the position already
                self._pos = {"version": self._start}
            sv, si = _norm_off(self._pos)
            if tip <= sv and si is None:
                return self._pos  # caught up: nothing to admit
            max_f = self._max_files or float("inf")
            max_b = self._max_bytes or float("inf")
            baseline = sv - 1 if si is not None else sv
            first = sv if si is not None else sv + 1
            taken_f = taken_b = 0
            end: dict = {"version": tip}
            for v, units, m in self._iter_units(baseline, first, tip):
                sizes = m.get("sizes") or {}
                consumed = si if (si is not None and v == sv) else 0
                for u in units[consumed:]:
                    entry = u.entry if self._cdf else u
                    if taken_f and (taken_f >= max_f or taken_b >= max_b):
                        # limit reached BEFORE this unit ("always admit
                        # at least one", Delta's rule, covers a single
                        # file larger than maxBytes)
                        end = (
                            {"version": v, "index": consumed}
                            if consumed < len(units)
                            else {"version": v}
                        )
                        self._pos = end
                        return end
                    taken_f += 1
                    # a pre-``sizes`` manifest (pre-upgrade history)
                    # admits by file count only: missing size = 0
                    taken_b += int(sizes.get(entry, 0))
                    consumed += 1
                if taken_f and (taken_f >= max_f or taken_b >= max_b):
                    end = {"version": v}
                    self._pos = end
                    return end
            self._pos = end
            return end

        def partitions(self, start, end):
            if self._pos is None:
                # restart: the engine replans the offset log's last
                # batch before its first poll — the checkpointed end IS
                # the position to resume admission from
                self._pos = dict(end)
            sv, si = _norm_off(start)
            ev, ei = _norm_off(end)
            if (sv, si) == (ev, ei):
                return []
            baseline = sv - 1 if si is not None else sv
            first = sv if si is not None else sv + 1
            out: list[_SnapshotFilePartition] = []
            if self._cdf:
                for v, specs, m in _iter_cdf_version_specs(
                    self._storage, self._root, baseline, first, ev
                ):
                    lo = si if (si is not None and v == sv) else 0
                    hi = ei if (ei is not None and v == ev) else len(specs)
                    out.extend(
                        _filter_cdf_specs(specs[lo:hi], m, self._filters)
                    )
                return out
            from ..plans.snapshots import _effective_stats, _phys_types

            for v, fresh, m in _iter_version_deltas(
                self._storage, self._root, baseline, first, ev
            ):
                lo = si if (si is not None and v == sv) else 0
                hi = ei if (ei is not None and v == ev) else len(fresh)
                chunk = fresh[lo:hi]
                if self._filters and chunk:
                    types = _phys_types(m)
                    chunk = [
                        f
                        for f in chunk
                        if all(
                            _survives(
                                _effective_stats(m, f, types), c, op, v2
                            )
                            for c, op, v2 in self._filters
                        )
                    ]
                out.extend(_SnapshotFilePartition(f) for f in chunk)
            return out

        def read(self, partition: "_SnapshotFilePartition"):
            source = self._storage.open_data_file(self._root, partition.entry)
            if self._cdf:
                import pyarrow as pa

                selected = None
                if partition.mode == "select":
                    selected = _dv_positions(
                        self._storage,
                        self._root,
                        partition.dv_paths,
                        partition.rel_key,
                    )
                fields = list(self._schema.fields)[:-2]  # table columns
                names = [f.name for f in fields] + [
                    "_change_type",
                    "_commit_version",
                ]
                for batch in _iter_file_batches(
                    source,
                    fields,
                    self._filters,
                    selected=selected,
                ):
                    n = batch.num_rows
                    arrays = list(batch.columns) + [
                        pa.array([partition.change] * n, type=pa.string()),
                        pa.array([partition.version] * n, type=pa.int64()),
                    ]
                    yield pa.RecordBatch.from_arrays(arrays, names=names)
                return
            # append-lineage delta files never carry deletion vectors
            # (dv commits raise in _delta_files), so deleted=() here
            yield from _iter_file_batches(
                source, list(self._schema.fields), self._filters
            )

        def commit(self, end):
            # offsets live in the engine's checkpoint; just track the
            # position (defensive second recovery channel after
            # ``partitions`` — the engine commits the replayed batch
            # before polling for a new one)
            if self._pos is None:
                self._pos = dict(end)

    class SnapshotTableStreamSource(DataSource):
        """``format("snapshot_table")`` — see module docstring. Serves
        all FOUR halves of the DataSource API: ``spark.readStream``
        (versions as offsets) and ``spark.read`` (one task per file of
        the addressed version — ``version`` / ``timestamp`` options are
        time travel through the standard reader API, and deletion-vector
        versions read correctly) on the read side; ``df.write`` (append/
        overwrite through the manifest protocol) and ``df.writeStream``
        (exactly-once ledgered sink) via ``snapshot_sink.py`` on the
        write side."""

        @classmethod
        def name(cls):
            return "snapshot_table"

        def schema(self):
            from pyspark.sql.types import LongType, StringType, StructType

            root = self.options.get("root")
            if not root:
                raise ValueError("snapshot_table source requires option 'root'")
            storage = storage_for_root(root)
            v = _resolve_version_py(storage, root, self.options)
            schema = StructType.fromJson(
                json.loads(_read_manifest_py(storage, root, v)["schema"])
            )
            if str(self.options.get("changefeed", "")).lower() in ("true", "1"):
                schema = schema.add("_change_type", StringType()).add(
                    "_commit_version", LongType()
                )
            return schema

        def streamReader(self, schema):
            return _SnapshotStreamReader(schema, self.options)

        def reader(self, schema):
            return _SnapshotBatchReader(schema, self.options)

        def writer(self, schema, overwrite):
            from .snapshot_sink import SnapshotTableWriter

            return SnapshotTableWriter(schema, self.options, overwrite)

        def streamWriter(self, schema, overwrite):
            from .snapshot_sink import SnapshotTableStreamWriter

            return SnapshotTableStreamWriter(schema, self.options, overwrite)

except ImportError:  # pragma: no cover - pyspark < 4
    SnapshotTableStreamSource = None  # type: ignore[assignment]


def register_snapshot_stream_source(spark) -> None:
    """Idempotent registration of the snapshot_table streaming source."""
    if SnapshotTableStreamSource is None:  # pragma: no cover
        raise ImportError("snapshot_table source needs pyspark >= 4")
    spark.dataSource.register(SnapshotTableStreamSource)
