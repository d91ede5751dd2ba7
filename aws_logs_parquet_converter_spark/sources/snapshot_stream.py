"""Snapshot-manifest tables as a STRUCTURED STREAMING SOURCE.

``spark.readStream.format("snapshot_table").option("root", ...)`` turns a
versioned table (plans/snapshots.py) into a stream of its appended rows —
the "table as a stream" half of the Delta design (Armbrust et al.,
VLDB'20 §4.3: a streaming source whose offsets are log positions), built
on the Spark 4 Python DataSource API:

* **Offsets are version numbers.** ``latestOffset`` lists the manifest
  directory (O(#versions) metadata, no data access); a micro-batch covers
  the versions committed since the last checkpointed offset. Replay of a
  batch re-reads the same version range — deterministic by manifest
  immutability, so the engine's own checkpoint gives exactly-once into
  any idempotent sink. This composes with the OTHER direction
  (streaming/events.py writes micro-batches AS manifest versions): two
  tables chained through a snapshot table form an end-to-end
  exactly-once pipeline.
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

Storage access here is ``os``-level (the driver-side offset tracker and
executor-side readers run outside the JVM, so Hadoop FS isn't
reachable): local/NFS paths as shipped. An object-store deployment
implements the same three primitives (list versions, read manifest, open
file) against its SDK — the seam is the three module functions below.
"""

from __future__ import annotations

import json
import os

__all__ = ["SnapshotTableStreamSource", "register_snapshot_stream_source"]


def _list_versions_py(root: str) -> list[int]:
    d = os.path.join(root, "_snapshots")
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json") and name[1:-5].isdigit():
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_raw_manifest_py(root: str, version: int) -> dict:
    with open(os.path.join(root, "_snapshots", f"v{version:08d}.json")) as fh:
        return json.load(fh)


def _read_manifest_py(root: str, version: int) -> dict:
    """RESOLVED manifest of ``version`` — full manifests load directly;
    delta-encoded ones (``base``/``adds``/``removes``, the log-segment
    form) walk back to their checkpoint and materialize, sharing the
    pure-Python resolver with plans.snapshots."""
    raw = _read_raw_manifest_py(root, version)
    if "files" in raw:
        return raw
    from ..plans.snapshots import resolve_manifest_chain

    chain = [raw]
    while "files" not in chain[-1]:
        chain.append(_read_raw_manifest_py(root, int(chain[-1]["base"])))
    return resolve_manifest_chain(list(reversed(chain)))


def _delta_files(
    root: str, start_v: int, end_v: int
) -> tuple[list[str], str, dict]:
    """(delta file list, schema JSON of the range's newest manifest,
    per-file stats for the delta files) — the snapshot_changes walk,
    shared by partition planning. Stats come from the manifest that
    introduced each file (the commit-time min/max the writer gathered)."""
    if _read_manifest_py(root, end_v).get("column_mapping"):
        # mirror plans.snapshots._require_unmapped: files store PHYSICAL
        # names — planning them under logical names would read NULLs
        raise ValueError(
            "the snapshot DataSource does not support column-mapped tables "
            "(a column was renamed via snapshot_rename_column); rewrite "
            "the table (mode='overwrite') to materialize the rename"
        )
    seen: set[str] = set()
    if start_v > 0:
        seen = set(_read_manifest_py(root, start_v)["files"])
    delta: list[str] = []
    stats: dict[str, dict] = {}
    schema_json = None
    for v in range(start_v + 1, end_v + 1):
        m = _read_manifest_py(root, v)
        schema_json = m["schema"]
        files = set(m["files"])
        action = m.get("action", "append")
        if action == "optimize":
            seen = files
            continue
        if action in ("overwrite", "merge", "delete", "restore", "update"):
            raise ValueError(
                f"snapshot stream hit a {action!r} commit at version {v} — "
                "rows were rewritten; restart the stream from a fresh "
                "baseline (startingVersion)"
            )
        fresh = sorted(files - seen)
        delta.extend(fresh)
        m_stats = m.get("stats", {})
        for f in fresh:
            if f in m_stats:
                stats[f] = m_stats[f]
        seen = files
    if schema_json is None:
        schema_json = _read_manifest_py(root, end_v)["schema"]
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


def _resolve_version_py(root: str, options) -> int:
    """The version a batch read addresses: explicit ``version`` option,
    else ``timestamp`` (epoch seconds — newest manifest whose mtime is
    at-or-before it, the TIMESTAMP AS OF rule of
    plans.snapshots.snapshot_version_as_of), else latest."""
    vs = _list_versions_py(root)
    if not vs:
        raise FileNotFoundError(f"snapshot table {root} has no commits")
    if options.get("version") is not None:
        v = int(options["version"])
        if v not in vs:
            raise FileNotFoundError(f"snapshot table {root} has no version {v}")
        return v
    if options.get("timestamp") is not None:
        ts = float(options["timestamp"])
        best = None
        for v in vs:
            p = os.path.join(root, "_snapshots", f"v{v:08d}.json")
            if os.path.getmtime(p) <= ts and (best is None or v > best):
                best = v
        if best is None:
            raise ValueError(
                f"snapshot table {root} has no version committed at or "
                f"before {ts}"
            )
        return best
    return vs[-1]


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
        def __init__(
            self,
            path: str,
            deleted: tuple = (),
            selected: tuple | None = None,
            change: str | None = None,
            version: int | None = None,
        ):
            self.path = path
            #: sorted ROW INDEXES this version's deletion vectors remove
            #: from the file (batch reads of dv-carrying versions)
            self.deleted = deleted
            #: change-feed mode: emit ONLY these row indexes (the rows a
            #: delete/update vector named), with the tag below
            self.selected = selected
            self.change = change
            self.version = version

    def _iter_file_batches(path, fields, filters, deleted=(), selected=None):
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
        pf = pq.ParquetFile(path)
        have = set(pf.schema_arrow.names)
        cols_present = [f.name for f in fields if f.name in have]
        offset = 0
        for batch in pf.iter_batches(columns=cols_present):
            n = batch.num_rows
            cols = []
            for f in fields:
                if f.name in have:
                    cols.append(batch.column(f.name))
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

    def _cdf_partition_specs(
        root: str, start_v: int, end_v: int
    ) -> list[tuple]:
        """Driver-side plan of a CHANGE-FEED micro-batch — the streaming
        analogue of plans.snapshots.snapshot_cdf: one spec per (file,
        change_type) in the version range. Append-lineage commits emit
        their fresh files as ``insert``; a dv delete emits the rows its
        NEW vector names (``delete``) by reading the vector parquet
        driver-side (O(#deleted rows) metadata) and grouping positions
        per touched file; a dv update emits both halves
        (``update_preimage`` from the vector, ``update_postimage`` from
        its fresh files). Commits without row lineage raise the
        re-baseline error. Spec: (path, selected_positions|None,
        change_type, version)."""
        import pyarrow.parquet as pq

        from ..plans.snapshots import _rel_key

        if _read_manifest_py(root, end_v).get("column_mapping"):
            raise ValueError(
                "the snapshot change feed does not support column-mapped "
                "tables (a column was renamed via snapshot_rename_column)"
            )
        seen_files: set = set()
        seen_dv: set = set()
        if start_v > 0:
            base = _read_manifest_py(root, start_v)
            seen_files = set(base["files"])
            seen_dv = set(base.get("dv", ()))
        specs: list[tuple] = []
        for v in range(start_v + 1, end_v + 1):
            m = _read_manifest_py(root, v)
            files, dv = set(m["files"]), set(m.get("dv", ()))
            action = m.get("action", "append")
            if action == "optimize":
                seen_files, seen_dv = files, dv
                continue
            is_dv_delete = (
                action == "delete" and files == seen_files and dv > seen_dv
            )
            is_dv_update = (
                action == "update" and files >= seen_files and dv > seen_dv
            )
            if action in ("overwrite", "merge", "restore") or (
                action == "delete" and not is_dv_delete
            ) or (action == "update" and not is_dv_update):
                raise ValueError(
                    f"snapshot change feed hit a {action!r} commit at "
                    f"version {v} without row-level lineage; restart the "
                    "stream from a fresh baseline (startingVersion)"
                )
            if is_dv_delete or is_dv_update:
                tag = "update_preimage" if is_dv_update else "delete"
                positions: dict[str, list[int]] = {}
                for p in sorted(dv - seen_dv):
                    t = pq.read_table(os.path.join(root, p))
                    for f, pos in zip(
                        t.column("file").to_pylist(), t.column("pos").to_pylist()
                    ):
                        positions.setdefault(f, []).append(pos)
                by_rel = {_rel_key(f): f for f in files}
                for relk, poss in sorted(positions.items()):
                    entry = by_rel.get(relk, relk)
                    specs.append(
                        (
                            os.path.join(root, entry),
                            tuple(sorted(poss)),
                            tag,
                            v,
                        )
                    )
            if not is_dv_delete:
                tag = "update_postimage" if is_dv_update else "insert"
                for f in sorted(files - seen_files):
                    specs.append((os.path.join(root, f), None, tag, v))
            seen_files, seen_dv = files, dv
        return specs

    class _SnapshotBatchReader(DataSourceReader):
        """``spark.read.format("snapshot_table")`` — the BATCH half of
        the source: one task per data file of the addressed version
        (``version`` / ``timestamp`` / latest), manifest-stats file
        pruning for the ``filters`` option, and deletion-vector
        subtraction planned per file (the version's vectors are grouped
        by file at planning time — O(#deleted rows) driver metadata —
        and each task masks its own row indexes, so a dv-carrying
        version reads correctly through the plain reader API)."""

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
            self._version = _resolve_version_py(self._root, options)
            self._filters = _parse_filters(options)

        def partitions(self):
            m = _read_manifest_py(self._root, self._version)
            if m.get("column_mapping"):
                raise ValueError(
                    "the snapshot DataSource does not support column-mapped "
                    "tables (a column was renamed via snapshot_rename_column)"
                    "; use snapshot_read, which applies the mapping"
                )
            files = m["files"]
            stats = m.get("stats", {})
            if self._filters:
                files = [
                    f
                    for f in files
                    if all(
                        _survives(stats.get(f), c, op, v)
                        for c, op, v in self._filters
                    )
                ]
            deleted: dict[str, list[int]] = {}
            if m.get("dv"):
                import pyarrow.parquet as pq

                from ..plans.snapshots import _rel_key

                # vectors key files by their data/<commit>/<part> tail;
                # clone manifests hold absolute entries — match normalized
                keep = {_rel_key(f): f for f in files}
                for p in m["dv"]:
                    t = pq.read_table(os.path.join(self._root, p))
                    for f, pos in zip(
                        t.column("file").to_pylist(), t.column("pos").to_pylist()
                    ):
                        if f in keep:
                            deleted.setdefault(keep[f], []).append(pos)
            return [
                _SnapshotFilePartition(
                    os.path.join(self._root, f),
                    tuple(sorted(deleted.get(f, ()))),
                )
                for f in files
            ]

        def read(self, partition: "_SnapshotFilePartition"):
            yield from _iter_file_batches(
                partition.path,
                list(self._schema.fields),
                self._filters,
                partition.deleted,
            )

    class _SnapshotStreamReader(DataSourceStreamReader):
        def __init__(self, schema, options):
            self._schema = schema
            self._root = options.get("root")
            if not self._root:
                raise ValueError("snapshot_table source requires option 'root'")
            self._start = int(options.get("startingversion", "0"))
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

        def initialOffset(self):
            return {"version": self._start}

        def latestOffset(self):
            vs = _list_versions_py(self._root)
            return {"version": vs[-1] if vs else self._start}

        def partitions(self, start, end):
            if self._cdf:
                return [
                    _SnapshotFilePartition(
                        path, selected=sel, change=tag, version=v
                    )
                    for path, sel, tag, v in _cdf_partition_specs(
                        self._root, int(start["version"]), int(end["version"])
                    )
                ]
            delta, _, stats = _delta_files(
                self._root, int(start["version"]), int(end["version"])
            )
            if self._filters:
                delta = [
                    f
                    for f in delta
                    if all(
                        _survives(stats.get(f), c, op, v)
                        for c, op, v in self._filters
                    )
                ]
            return [
                _SnapshotFilePartition(os.path.join(self._root, f))
                for f in delta
            ]

        def read(self, partition: "_SnapshotFilePartition"):
            if self._cdf:
                import pyarrow as pa

                fields = list(self._schema.fields)[:-2]  # table columns
                names = [f.name for f in fields] + [
                    "_change_type",
                    "_commit_version",
                ]
                for batch in _iter_file_batches(
                    partition.path,
                    fields,
                    self._filters,
                    selected=partition.selected,
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
                partition.path, list(self._schema.fields), self._filters
            )

        def commit(self, end):
            pass  # offsets live in the engine's checkpoint; nothing to do

    class SnapshotTableStreamSource(DataSource):
        """``format("snapshot_table")`` — see module docstring. Serves
        BOTH halves of the reader API: ``spark.readStream`` (versions as
        offsets) and ``spark.read`` (one task per file of the addressed
        version — ``version`` / ``timestamp`` options are time travel
        through the standard reader API, and deletion-vector versions
        read correctly)."""

        @classmethod
        def name(cls):
            return "snapshot_table"

        def schema(self):
            from pyspark.sql.types import LongType, StringType, StructType

            root = self.options.get("root")
            if not root:
                raise ValueError("snapshot_table source requires option 'root'")
            v = _resolve_version_py(root, self.options)
            schema = StructType.fromJson(
                json.loads(_read_manifest_py(root, v)["schema"])
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

except ImportError:  # pragma: no cover - pyspark < 4
    SnapshotTableStreamSource = None  # type: ignore[assignment]


def register_snapshot_stream_source(spark) -> None:
    """Idempotent registration of the snapshot_table streaming source."""
    if SnapshotTableStreamSource is None:  # pragma: no cover
        raise ImportError("snapshot_table source needs pyspark >= 4")
    spark.dataSource.register(SnapshotTableStreamSource)
