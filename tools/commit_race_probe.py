"""Randomized cross-PROCESS commit-race stressor for the snapshot-table
protocol (r7 verdict task 3) — the dedicated hunt for the once-observed,
never-reproduced lost-append (800-vs-900 rows, 2026-08-15; see
tests/test_snapshots.py::test_concurrent_append_vs_optimize_and_disjoint_merge
forensics).

Shape: per trial, P real OS processes (each its own SparkSession — its
own JVM, so the LogStore's atomic-rename CAS is exercised across process
boundaries, not just threads) hammer ONE table on tmpfs with randomized
interleavings of append / merge / cow-delete / dv-delete / OPTIMIZE —
and, on property trials, the inline auto-compaction every write triggers.
Each process owns a disjoint id space and returns the log of ops that
actually COMMITTED (a lost CAS or a refused rebase raises IOError — the
op then simply didn't happen and is not logged). The checker replays the
logs into the expected id set and asserts ROW CONSERVATION: the final
table must hold exactly the committed appends minus the committed
deletes, values intact. On a mismatch it dumps the full commit chain
(version, action, per-commit file tails) — the forensics that turn the
next occurrence into a diagnosable event instead of a flaky test.

Knobs: RACE_TRIALS (default 6), RACE_PROCS (4), RACE_OPS (40 per
process). Defaults land ~960 randomized op interleavings in ~6 min.
Findings go to SCALE.md.

Run: PYTHONPATH=. python tools/commit_race_probe.py
"""

from __future__ import annotations

import json
import multiprocessing
import os
import random
import sys
import tempfile
import time
from concurrent.futures import ProcessPoolExecutor

TRIALS = int(os.environ.get("RACE_TRIALS", "6"))
PROCS = int(os.environ.get("RACE_PROCS", "4"))
OPS = int(os.environ.get("RACE_OPS", "40"))
#: RACE_SCHEME=flat races the SAME mix over a flat:// object-store root:
#: manifests commit via conditional whole-object PUT
#: (FlatObjectStorage.put_if_absent_bytes), data publishes as whole
#: objects, vacuum deletes by prefix listing — the honest offline S3
#: twin, under real cross-process contention instead of the contract
#: test's threads. Empty (default) = plain local root via the JVM
#: Hadoop path + link(2) LogStore.
#:
#: RACE_SCHEME=s3 (r11, r10 verdict task 2) races the S3 write seam
#: over the REAL WIRE: a ThreadedMotoServer serves the S3 HTTP API, and
#: P OS processes hammer one s3://bucket/t table through the engine's
#: SESSION-FREE DataSource write paths (snapshot_sink._plan_write/
#: _write_task/_commit_files over S3ConditionalPutStorage) — real
#: whole-object PUTs, real If-None-Match conditional puts (moto
#: enforces 412 for CAS losers), real GET/LIST reads back. A
#: fault-injection wrapper around each worker's boto3 client
#: synthesizes 409 ConditionalRequestConflict on a fraction of FIRST
#: conditional-put attempts, so the 409->backoff->retry path is
#: observed WINNING under contention (it was unit-tested against
#: doubles only). Scope note, documented in SCALE.md: the full planner
#: verb mix (restore/drop-column/optimize/vacuum) cannot run over
#: s3:// in this container — those verbs scan data through the JVM,
#: which has no S3 filesystem here (and the seam requires
#: local_scan_path); the commit PROTOCOL those verbs share is the same
#: CAS this leg races, and the full mix runs under RACE_SCHEME=flat
#: against the same WritableObjectStorage contract.
SCHEME = os.environ.get("RACE_SCHEME", "")
#: probability an s3 worker's FIRST conditional-put attempt on a fresh
#: manifest key gets a synthesized 409 (the retry must then win)
S3_FAULT_P = float(os.environ.get("RACE_S3_FAULT_P", "0.25"))
#: replay knob: worker seeds are SEED_BASE + trial*1000 + proc, so a
#: failing trial's exact op sequences re-run with RACE_SEED_BASE +
#: RACE_TRIALS=1 (interleaving still OS-scheduled — rerun to reproduce)
SEED_BASE = int(os.environ.get("RACE_SEED_BASE", "0"))

#: op mix: appends dominate (they did in the observed failure's suite),
#: maintenance and row-rewrites interleave constantly. Vacuum races with
#: its DEFAULT min_age guard (r8 verdict task 7): under contention the
#: guard must keep every data object any committed version references —
#: during the probe everything is younger than the window, so a racing
#: vacuum may retire dropped MANIFESTS but never a live data file; the
#: min_age=0 legs (dry + real) run quiescently per trial in the checker,
#: exactly the single-committer precondition the docstring sets for 0.
_OP_MIX = (
    "append", "append", "append",
    "merge",
    "delete_cow", "delete_dv",
    "update",
    "optimize",
    "vacuum",
    # round-9 surfaces: metadata commits racing data commits.
    # "constraint" randomly ADDs or DROPs an always-true CHECK — the
    # interesting victim is a concurrent append whose constraint set
    # GREW between its file write and its manifest CAS (the
    # checked_against re-validation path); accounting is unaffected
    # because the contract holds for every row the probe ever writes.
    # Mixed-WIDTH appends (int32/float32 vs long/double, below) race
    # the type-widening schema merge and the upcast-on-write path —
    # values are numerically identical either width, so the checker's
    # value-exact accounting is blind to representation, as it must be.
    "constraint",
    # round-10 surfaces (r9 VERDICT task 7): RESTORE rewrites the file
    # list wholesale (a buggy one could absorb or drop a concurrent
    # append's files) and DROP COLUMN rewrites schema+tombstones (a
    # buggy one could resurrect dropped values). Both need the checker's
    # VERSION-ORDERED replay: a restore's effect depends on global
    # commit order, which the manifest version numbers record exactly.
    "restore",
    "drop_column",
)

#: the additive an UPDATE op applies to `v` — large enough that missed,
#: doubled, or resurrected updates are unmistakable in the value check
_UPD_DELTA = 9_000_000


def _worker(args: tuple) -> list[tuple]:
    root, seed, proc_id, n_ops = args
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        current_version,
        read_manifest,
        snapshot_add_constraint,
        snapshot_delete,
        snapshot_drop_column,
        snapshot_drop_constraint,
        snapshot_merge,
        snapshot_optimize,
        snapshot_restore,
        snapshot_update,
        snapshot_vacuum,
        snapshot_write,
    )
    from aws_logs_parquet_converter_spark.session import build_session

    spark = build_session(
        app_name=f"race_probe_{proc_id}",
        master="local[2]",
        shuffle_partitions=2,
        extra_conf={"spark.ui.enabled": "false"},
    )
    rng = random.Random(seed)
    base = 1_000_000 * (proc_id + 1)  # disjoint id space per process
    next_id = base
    # committed ops as dicts CARRYING THE COMMIT VERSION: the checker
    # replays them in version order (required once RESTORE is in the
    # mix — its effect depends on global commit order, and manifest
    # version numbers record that order exactly)
    committed: list[dict] = []
    my_ranges: list[tuple[int, int]] = []  # committed, not-yet-deleted
    # per-op journal, flushed BEFORE (intent) and AFTER (result) each op:
    # the forensic record that survives the worker process — what each op
    # believed happened vs the commit chain's ground truth
    phys = root.split("://", 1)[1] if "://" in root else root
    jpath = os.path.join(os.path.dirname(phys), f"worker_{proc_id}.jsonl")
    jf = open(jpath, "a", buffering=1)

    def log(**kw):
        jf.write(json.dumps(kw) + "\n")

    try:
        for i in range(n_ops):
            op = rng.choice(_OP_MIX)
            try:
                if op == "append":
                    lo = next_id
                    hi = lo + rng.randint(5, 60)
                    next_id = hi
                    # half the appends arrive NARROW (int32 v): the first
                    # committed width sets the base, and every later
                    # mismatch exercises the widening merge or the
                    # upcast-on-write under CAS rebase (ids stay < 2^31)
                    narrow = rng.random() < 0.5
                    # a quarter carry the droppable `aux` column — its
                    # schema-merge add and drop_column tombstoning race
                    # real commits. A RE-ADD after a drop would make the
                    # table column-mapped, where delete/update/merge
                    # refuse by documented design (plans/snapshots
                    # _require_unmapped) — that would gut the DML mix, so
                    # aux appends pre-check the tombstones; the unavoidable
                    # check-to-commit race window is handled by the DML
                    # ops treating the mapped refusal as a legal outcome
                    with_aux = rng.random() < 0.25
                    if with_aux:
                        tip = current_version(spark, root)
                        dropped = read_manifest(spark, root, tip).get(
                            "dropped_cols", []
                        )
                        if any(d.get("name") == "aux" if isinstance(d, dict)
                               else d == "aux" for d in dropped):
                            with_aux = False
                    log(i=i, op=op, lo=lo, hi=hi, narrow=narrow,
                        aux=with_aux, phase="intent")
                    exprs = [
                        "id",
                        "CAST(id * 2 AS INT) AS v" if narrow
                        else "id * 2 AS v",
                    ]
                    if with_aux:
                        exprs.append("id * 3 AS aux")
                    df = spark.range(lo, hi).selectExpr(*exprs)
                    v = snapshot_write(df, root, stats_cols=["id"])
                    log(i=i, op=op, lo=lo, hi=hi, phase="done", version=v)
                    if v is not None:
                        committed.append(
                            {"kind": "add", "lo": lo, "hi": hi, "ver": v,
                             "aux": with_aux}
                        )
                        my_ranges.append((lo, hi))
                elif op == "merge":
                    # fresh disjoint keys: an upsert of never-seen ids —
                    # provably append-shaped, so rebase applies; an abort
                    # under an interleaved rewrite is the designed refusal
                    lo = next_id
                    hi = lo + rng.randint(3, 25)
                    next_id = hi
                    log(i=i, op=op, lo=lo, hi=hi, phase="intent")
                    df = spark.range(lo, hi).selectExpr("id", "id * 2 AS v")
                    try:
                        v = snapshot_merge(df, root, key="id")
                    except ValueError as e:
                        # table went column-mapped under us (a drop/re-add
                        # race): the refusal is the documented contract
                        if "column-mapped" not in str(e):
                            raise
                        log(i=i, op=op, lo=lo, hi=hi, phase="refused",
                            err=str(e)[:120])
                        continue
                    log(i=i, op=op, lo=lo, hi=hi, phase="done", version=v)
                    if v is not None:
                        committed.append(
                            {"kind": "add", "lo": lo, "hi": hi, "ver": v,
                             "aux": False}
                        )
                        my_ranges.append((lo, hi))
                elif op in ("delete_cow", "delete_dv") and my_ranges:
                    lo, hi = my_ranges.pop(rng.randrange(len(my_ranges)))
                    mid = rng.randint(lo + 1, hi)  # drop the range's head
                    log(i=i, op=op, lo=lo, mid=mid, hi=hi, phase="intent")
                    try:
                        v = snapshot_delete(
                            spark,
                            root,
                            [("id", ">=", lo), ("id", "<", mid)],
                            mode="dv" if op == "delete_dv" else "cow",
                        )
                    except ValueError as e:
                        if "column-mapped" not in str(e):
                            raise
                        log(i=i, op=op, lo=lo, mid=mid, hi=hi,
                            phase="refused", err=str(e)[:120])
                        my_ranges.append((lo, hi))  # nothing deleted
                        continue
                    log(i=i, op=op, lo=lo, mid=mid, hi=hi, phase="done", version=v)
                    if v is not None:
                        committed.append(
                            {"kind": "del", "lo": lo, "hi": mid, "ver": v}
                        )
                    if mid < hi:
                        my_ranges.append((mid, hi))
                elif op == "update" and my_ranges:
                    # update the head of a live range IN PLACE (no pop —
                    # repeated updates of the same rows are legal and the
                    # value accounting is cumulative)
                    lo, hi = my_ranges[rng.randrange(len(my_ranges))]
                    mid = rng.randint(lo + 1, hi)
                    mode = rng.choice(["cow", "dv"])
                    log(i=i, op=op, mode=mode, lo=lo, mid=mid, phase="intent")
                    try:
                        v = snapshot_update(
                            spark,
                            root,
                            [("id", ">=", lo), ("id", "<", mid)],
                            {"v": f"v + {_UPD_DELTA}"},
                            mode=mode,
                        )
                    except ValueError as e:
                        if "column-mapped" not in str(e):
                            raise
                        log(i=i, op=op, mode=mode, lo=lo, mid=mid,
                            phase="refused", err=str(e)[:120])
                        continue
                    log(i=i, op=op, mode=mode, lo=lo, mid=mid, phase="done", version=v)
                    if v is not None:
                        committed.append(
                            {"kind": "upd", "lo": lo, "hi": mid, "ver": v}
                        )
                elif op == "optimize":
                    # row-preserving by contract: nothing to log in the
                    # accounting (the journal still records it)
                    log(i=i, op=op, phase="intent")
                    v = snapshot_optimize(
                        spark, root, target_file_mb=rng.choice([0.05, 0.2, 1.0])
                    )
                    log(i=i, op=op, phase="done", version=v)
                elif op == "vacuum":
                    # DEFAULT min_age guard under full contention: data
                    # objects younger than the window (all of them, in a
                    # minutes-long trial) must survive; only retired
                    # manifests may go. Row conservation plus the
                    # checker's every-version files-exist walk prove no
                    # kept version lost a file to this. Dry runs
                    # interleave too (must delete nothing).
                    dry = rng.random() < 0.4
                    keep = rng.choice([2, 3, 5])
                    log(i=i, op=op, dry=dry, keep=keep, phase="intent")
                    gone = snapshot_vacuum(
                        spark, root, keep_last=keep, dry_run=dry
                    )
                    log(
                        i=i, op=op, dry=dry, keep=keep, phase="done",
                        n_deleted=len(gone),
                        data_deleted=sum(
                            1 for p in gone if p.startswith("data/")
                        ),
                    )
                elif op == "constraint":
                    # metadata commit racing data commits: add or drop an
                    # ALWAYS-TRUE check (every row the probe writes keeps
                    # v >= 0, updates included). The victim under test is
                    # a concurrent append whose constraint set grew
                    # between its file write and its CAS — it must
                    # re-validate, never commit unchecked (ValueError =
                    # the name raced in/out under us: a legal outcome)
                    adding = rng.random() < 0.5
                    log(i=i, op=op, adding=adding, phase="intent")
                    try:
                        if adding:
                            v = snapshot_add_constraint(
                                spark, root, "v_nonneg", "v >= 0"
                            )
                        else:
                            v = snapshot_drop_constraint(
                                spark, root, "v_nonneg"
                            )
                        log(i=i, op=op, adding=adding, phase="done", version=v)
                    except (ValueError, FileNotFoundError) as e:
                        log(i=i, op=op, adding=adding, phase="refused",
                            err=str(e)[:120])
                elif op == "restore":
                    # roll back 0-2 versions from the tip observed NOW.
                    # Restore's CAS loop rebases onto whatever commits
                    # interleave, so the content outcome depends on
                    # global order — the version-ordered replay accounts
                    # for it exactly. A buggy restore (absorbing a
                    # concurrent append's files, resurrecting wrong
                    # tombstones) shows up as a value mismatch.
                    tip = current_version(spark, root)
                    target = max(1, tip - rng.randint(0, 2))
                    log(i=i, op=op, target=target, phase="intent")
                    try:
                        v = snapshot_restore(spark, root, version=target)
                    except (ValueError, FileNotFoundError) as e:
                        # target vacuumed/retired under us: a legal race
                        log(i=i, op=op, target=target, phase="refused",
                            err=str(e)[:120])
                        continue
                    log(i=i, op=op, target=target, phase="done", version=v)
                    if v != target:  # no-op restores commit nothing
                        committed.append(
                            {"kind": "restore", "target": target, "ver": v}
                        )
                elif op == "drop_column":
                    # metadata-only DROP of `aux` racing the appends that
                    # re-add it (fresh physical name via column mapping).
                    # Resurrected values from pre-drop files would trip
                    # the checker's aux replay.
                    log(i=i, op=op, phase="intent")
                    try:
                        v = snapshot_drop_column(spark, root, "aux")
                    except (ValueError, FileNotFoundError) as e:
                        # not in the schema right now: a legal race
                        log(i=i, op=op, phase="refused", err=str(e)[:120])
                        continue
                    log(i=i, op=op, phase="done", version=v)
                    committed.append({"kind": "dropcol", "ver": v})
            except IOError as e:
                log(i=i, op=op, phase="ioerror", err=str(e)[:160])
    finally:
        jf.close()
        spark.stop()
    return committed


def _forensics(spark, root: str, missing: set, extra: set) -> None:
    """Written NEXT TO the table (survives any output truncation): the
    full missing/extra id lists, each anomalous id mapped to the file
    holding it and the version that introduced that file, and the whole
    commit chain — read together with the worker_*.jsonl journals."""
    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.plans.snapshots import (
        current_version,
        read_manifest,
        snapshot_read,
    )

    phys = root.split("://", 1)[1] if "://" in root else root
    out = open(os.path.join(os.path.dirname(phys), "forensics.jsonl"), "w")

    def emit(obj):
        line = json.dumps(obj)
        out.write(line + "\n")
        print(line)

    emit(
        {
            "root": root,
            "missing": sorted(missing),
            "extra": sorted(extra),
        }
    )
    if extra:
        rows = (
            snapshot_read(spark, root)
            .where(F.col("id").isin([int(x) for x in extra]))
            .select("id", F.col("_metadata.file_path").alias("fp"))
            .collect()
        )
        emit({"extra_locations": {r.id: r.fp.rsplit("/", 2)[-2] for r in rows}})
    introduced = {}
    prev: set = set()
    for k in range(1, current_version(spark, root) + 1):
        mk = read_manifest(spark, root, k)
        for f in set(mk["files"]) - prev:
            introduced[f.rsplit("/", 2)[-2]] = k
        prev = set(mk["files"])
        emit(
            {
                "v": k,
                "action": mk.get("action"),
                "n_files": len(mk["files"]),
                "dv": len(mk.get("dv", [])),
                "files": sorted(f[-46:] for f in mk["files"]),
                "dv_files": sorted(p[-46:] for p in mk.get("dv", [])),
            }
        )
    emit({"commit_dir_introduced_at": introduced})
    out.close()


def _versions_with_all_files(
    spark, root: str, only_last: int | None = None
) -> tuple[int, list[str]]:
    """Walk still-listed versions: resolve each manifest and stat every
    file it references (data + deletion vectors + bloom sidecars).
    Returns (versions_checked, missing_refs) — a non-empty second half
    is the 'kept version references a deleted file' corruption class the
    vacuum legs exist to rule out. ``only_last`` restricts the walk to
    the newest N versions — required AFTER a real vacuum, whose retired
    versions legitimately keep their (tiny) manifests as delta-chain
    metadata while their data files are gone; with the DEFAULT min_age
    guard under race, every surviving version must walk clean."""
    from aws_logs_parquet_converter_spark.plans.snapshots import read_manifest
    from aws_logs_parquet_converter_spark.storage import storage_for_root

    store = storage_for_root(root)
    if hasattr(store, "list_keys"):  # object-store root: one prefix LIST
        existing = set(store.list_keys(root, "data/"))
        exists = existing.__contains__
    else:
        exists = lambda f: os.path.exists(os.path.join(root, f))  # noqa: E731
    missing: list[str] = []
    versions = store.list_versions(root)
    if only_last is not None:
        versions = versions[-only_last:]
    for v in versions:
        m = read_manifest(spark, root, v)
        for f in (
            list(m["files"]) + list(m.get("dv", ())) +
            list(m.get("bloom", {}).get("files", ()))
        ):
            if not exists(f):
                missing.append(f"v{v}:{f}")
    return len(versions), missing


# ---------------------------------------------------------------------------
# RACE_SCHEME=s3: the write seam over the real S3 wire (moto server)
# ---------------------------------------------------------------------------


class _Faulty409Client:
    """boto3-client wrapper that synthesizes S3's 409
    ``ConditionalRequestConflict`` on a fraction of FIRST conditional-put
    attempts per manifest key (and only those): the engine's retry
    schedule must back off and WIN the key on the next attempt — a False
    here would be a lost commit, the exact failure the 409 mapping
    exists to prevent. Everything else passes straight through to the
    real wire."""

    def __init__(self, real, rng):
        self._real = real
        self._rng = rng
        self._seen: set = set()
        self.injected = 0  # synthesized 409s (reported by the worker)

    class _Conflict(Exception):
        def __init__(self):
            super().__init__("synthesized ConditionalRequestConflict")
            self.response = {"Error": {"Code": "ConditionalRequestConflict"}}

    def put_object(self, **kw):
        if (
            kw.get("IfNoneMatch") == "*"
            and "_snapshots/" in kw.get("Key", "")
            and kw["Key"] not in self._seen
        ):
            self._seen.add(kw["Key"])
            if self._rng.random() < S3_FAULT_P:
                self.injected += 1
                raise self._Conflict()
        return self._real.put_object(**kw)

    def __getattr__(self, name):  # everything else: the real client
        return getattr(self._real, name)


def _s3_worker(args: tuple) -> tuple:
    """One OS process hammering the table through the SESSION-FREE
    DataSource write paths: batch appends, idempotent-txn retries
    (second commit must skip), and stream-sink commits with
    re-deliveries (replays must skip). Returns (committed ops carrying
    their manifest versions for the replay, #409s injected into this
    worker's conditional puts)."""
    root, seed, proc_id, n_ops, jdir = args
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import boto3
    import pyarrow as pa

    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        _commit_files,
        _plan_write,
        _write_task,
    )
    from pyspark.sql.types import LongType, StructField, StructType

    rng = random.Random(seed)
    schema = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    )
    faulty = _Faulty409Client(boto3.client("s3"), rng)
    jf = open(os.path.join(jdir, f"s3_worker_{proc_id}.jsonl"), "a", buffering=1)

    def log(**kw):
        jf.write(json.dumps(kw) + "\n")

    def deliver(cfg, lo, hi):
        tbl = pa.table(
            {
                "id": pa.array(range(lo, hi), type=pa.int64()),
                "v": pa.array([2 * n for n in range(lo, hi)], type=pa.int64()),
            }
        )
        return _write_task(cfg, tbl.to_batches(max_chunksize=64))

    def plan(**opts) -> dict:
        overwrite = opts.pop("_overwrite", False)
        streaming = opts.pop("_streaming", False)
        cfg = _plan_write(
            schema, {"root": root, **opts}, overwrite, streaming=streaming
        )
        # swap the store's lazily-built client for the 409 injector —
        # the retry path must win these under real contention
        cfg["store"]._client = faulty
        return cfg

    base = 1_000_000 * (proc_id + 1)
    next_id = base
    stream_batch = 0
    txn_serial = 0
    committed: list[dict] = []
    try:
        for i in range(n_ops):
            op = rng.choice(
                ("append", "append", "append", "txn_retry", "stream", "stream")
            )
            lo = next_id
            hi = lo + rng.randint(5, 40)
            next_id = hi
            try:
                if op == "append":
                    log(i=i, op=op, lo=lo, hi=hi, phase="intent")
                    cfg = plan()
                    v = _commit_files(cfg, [deliver(cfg, lo, hi)])
                    log(i=i, op=op, phase="done", version=v)
                    committed.append(
                        {"kind": "add", "lo": lo, "hi": hi, "ver": v}
                    )
                elif op == "txn_retry":
                    # an idempotent batch job retried: exactly ONE of the
                    # two commits may land
                    txn_serial += 1
                    app = f"job-{proc_id}"
                    log(i=i, op=op, lo=lo, hi=hi, txn=txn_serial,
                        phase="intent")
                    vs = []
                    for _attempt in range(2):
                        cfg = plan(
                            txnappid=app, txnversion=str(txn_serial)
                        )
                        vs.append(
                            _commit_files(cfg, [deliver(cfg, lo, hi)])
                        )
                    log(i=i, op=op, phase="done", versions=vs)
                    landed = [v for v in vs if v is not None]
                    if len(landed) != 1:
                        raise AssertionError(
                            f"idempotent txn landed {len(landed)} times: {vs}"
                        )
                    committed.append(
                        {"kind": "add", "lo": lo, "hi": hi, "ver": landed[0]}
                    )
                elif op == "stream":
                    # a micro-batch commit, sometimes RE-DELIVERED: the
                    # second delivery of the same batch id must skip
                    app = f"stream-{proc_id}"
                    replayed = stream_batch > 0 and rng.random() < 0.4
                    bid = stream_batch - 1 if replayed else stream_batch
                    log(i=i, op=op, lo=lo, hi=hi, batch=bid,
                        replay=replayed, phase="intent")
                    cfg = plan(streamappid=app, _streaming=True)
                    v = _commit_files(
                        cfg, [deliver(cfg, lo, hi)], batch_id=bid
                    )
                    log(i=i, op=op, batch=bid, phase="done", version=v)
                    if replayed:
                        if v is not None:
                            raise AssertionError(
                                f"replayed batch {bid} committed again as v{v}"
                            )
                    else:
                        if v is None:
                            raise AssertionError(
                                f"fresh batch {bid} was wrongly skipped"
                            )
                        stream_batch += 1
                        committed.append(
                            {"kind": "add", "lo": lo, "hi": hi, "ver": v}
                        )
            except IOError as e:
                log(i=i, op=op, phase="ioerror", err=str(e)[:160])
    finally:
        jf.close()
    return committed, faulty.injected


def _s3_trial(trial: int, admin) -> dict:
    """One s3 trial: fresh bucket, P processes through the write seam,
    then a value-exact check read back OVER THE WIRE (storage seam +
    pyarrow — no Spark anywhere in this leg) plus a reference-integrity
    walk of every surviving version."""
    import io

    import pyarrow.parquet as pq

    from aws_logs_parquet_converter_spark import storage as st

    bucket = f"race-{trial}"
    admin.create_bucket(Bucket=bucket)
    root = f"s3://{bucket}/t"
    jdir = tempfile.mkdtemp(prefix=f"s3race_{trial}_")
    t0 = time.perf_counter()
    with ProcessPoolExecutor(
        max_workers=PROCS, mp_context=multiprocessing.get_context("spawn")
    ) as ex:
        outs = list(
            ex.map(
                _s3_worker,
                [
                    (root, SEED_BASE + trial * 1000 + p, p, OPS, jdir)
                    for p in range(PROCS)
                ],
            )
        )
    wall = time.perf_counter() - t0
    injected = sum(n for _ops, n in outs)
    events = sorted(
        (e for ops, _n in outs for e in ops), key=lambda e: e["ver"]
    )
    expected: dict[int, int] = {}
    for e in events:
        for n in range(e["lo"], e["hi"]):
            expected[n] = 2 * n
    store = st.storage_for_root(root)
    tip = st.current_version_fast(store, root)
    m = st.read_manifest(store, root, tip)
    got: dict[int, int] = {}
    for entry in m["files"]:
        t = pq.read_table(store.open_data_file(root, entry))
        got.update(zip(t.column("id").to_pylist(), t.column("v").to_pylist()))
    ok = got == expected
    # reference integrity: every surviving version's files exist on the
    # wire (one prefix LIST; the conditional put must never have let a
    # manifest reference a lost object)
    existing = set(store.list_keys(root, "data/"))
    missing: list[str] = []
    for v in store.list_versions(root):
        mv = st.read_manifest(store, root, v)
        missing.extend(
            f"v{v}:{f}" for f in mv["files"] if f not in existing
        )
    ok = ok and not missing
    # per-stream ledgers: each app's HWM must equal its last fresh batch
    ledger = m.get("stream_txns", {})
    return {
        "trial": trial,
        "committed_ops": len(events),
        "expected_rows": len(expected),
        "got_rows": len(got),
        "versions": tip,
        "injected_409s": injected,
        "stream_ledger": ledger,
        "missing_refs": missing[:10],
        "ok": ok,
        "wall_s": round(wall, 1),
        "journals": None if ok else jdir,
    }


def _s3_main() -> None:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import boto3
    from moto.server import ThreadedMotoServer

    port = int(os.environ.get("RACE_S3_PORT", "5199"))
    endpoint = f"http://127.0.0.1:{port}"
    os.environ["AWS_ENDPOINT_URL_S3"] = endpoint
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    server = ThreadedMotoServer(ip_address="127.0.0.1", port=port, verbose=False)
    server.start()
    try:
        admin = boto3.client("s3")
        results = [_s3_trial(t, admin) for t in range(TRIALS)]
        for r in results:
            print(json.dumps(r), flush=True)
        failed = sum(1 for r in results if not r["ok"])
        total_409 = sum(r["injected_409s"] for r in results)
        print(
            json.dumps(
                {
                    "probe": "commit_race_s3",
                    "trials": TRIALS,
                    "procs": PROCS,
                    "ops_per_proc": OPS,
                    "committed_ops_total": sum(
                        r["committed_ops"] for r in results
                    ),
                    "injected_409s_total": total_409,
                    "failures": failed,
                }
            )
        )
        if failed:
            raise SystemExit(1)
        if total_409 == 0:
            raise SystemExit(
                "no 409s were injected — raise RACE_S3_FAULT_P or OPS; the "
                "retry path was not observed"
            )
    finally:
        server.stop()


def main() -> None:
    if SCHEME == "s3":
        _s3_main()
        return
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )
    from aws_logs_parquet_converter_spark.session import build_session

    tmp_base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    spark = build_session(
        app_name="race_probe_checker",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    results = []
    failed = 0
    for trial in range(TRIALS):
        phys_base = tempfile.mkdtemp(prefix="race_", dir=tmp_base)
        root = phys_base + "/t"
        if SCHEME:  # e.g. flat:///dev/shm/race_x/t — object-store path
            root = f"{SCHEME}://{root}"
        # odd trials set the auto-compaction property: every write then
        # runs the inline trigger + incremental OPTIMIZE under race
        seed_kw = {"auto_compact_mb": 0.2} if trial % 2 else {}
        snapshot_write(
            spark.range(0, 100).selectExpr("id", "id * 2 AS v"),
            root,
            stats_cols=["id"],
            **seed_kw,
        )
        t0 = time.perf_counter()
        # spawn, not fork: a forked child inherits the checker's py4j
        # gateway and SparkSession singleton, which cannot be reused
        with ProcessPoolExecutor(
            max_workers=PROCS, mp_context=multiprocessing.get_context("spawn")
        ) as ex:
            logs = list(
                ex.map(
                    _worker,
                    [
                        (root, SEED_BASE + trial * 1000 + p, p, OPS)
                        for p in range(PROCS)
                    ],
                )
            )
        wall = time.perf_counter() - t0
        # VERSION-ORDERED value-exact replay (r10): with RESTORE in the
        # mix the final content depends on global commit ORDER, which
        # the manifest version numbers record exactly — so apply every
        # committed op at its version and snapshot state per version
        # for restore targets. Unlogged versions (optimize, constraint,
        # auto-compact) are row- and aux-preserving, so "state at t" =
        # state at the newest logged version <= t. Ghost/missed/doubled/
        # resurrected ops of EVERY verb — now including a restore that
        # absorbs a concurrent append or a drop that resurrects values —
        # are all visible in one dict compare.
        import bisect

        events = sorted(
            (e for log in logs for e in log), key=lambda e: e["ver"]
        )
        n_commits = len(events)
        state: dict[int, int] = {i: 2 * i for i in range(0, 100)}
        auxs: dict[int, int] = {}  # id -> aux value (absent = NULL)
        snaps: dict[int, tuple[dict, dict]] = {1: (dict(state), dict(auxs))}
        snap_vers: list[int] = [1]
        for e in events:
            k = e["kind"]
            if k == "add":
                for n in range(e["lo"], e["hi"]):
                    state[n] = 2 * n
                    if e["aux"]:
                        auxs[n] = 3 * n
                    else:
                        auxs.pop(n, None)
            elif k == "del":
                for n in range(e["lo"], e["hi"]):
                    state.pop(n, None)
                    auxs.pop(n, None)
            elif k == "upd":
                for n in range(e["lo"], e["hi"]):
                    if n in state:
                        state[n] += _UPD_DELTA
            elif k == "dropcol":
                auxs = {}  # logically NULL for every live row
            elif k == "restore":
                j = bisect.bisect_right(snap_vers, e["target"]) - 1
                s, a = snaps[snap_vers[j]]
                state, auxs = dict(s), dict(a)
            snaps[e["ver"]] = (dict(state), dict(auxs))
            snap_vers.append(e["ver"])
        expected = state
        final_rows = snapshot_read(spark, root).collect()
        got = {r.id: r.v for r in final_rows}
        ok = got == expected
        # aux resurrection check: pre-drop values must never reappear,
        # post-re-add values must be exactly the re-added batches'
        if final_rows and "aux" in final_rows[0].__fields__:
            got_aux = {r.id: r.aux for r in final_rows}
            exp_aux = {n: auxs.get(n) for n in expected}
            aux_ok = got_aux == exp_aux
        else:
            aux_ok = not auxs  # column absent => replay must hold none
        if not aux_ok:
            print(json.dumps({"aux_mismatch": True}), flush=True)
        ok = ok and aux_ok
        # vacuum-integrity leg 1: after the contention phase (racing
        # default-guard vacuums included), every surviving version must
        # still reference only existing files
        n_vers, missing_refs = _versions_with_all_files(spark, root)
        # vacuum-integrity leg 2 (quiescent — the single-committer
        # precondition min_age=0 documents): DRY must delete nothing and
        # predict exactly what REAL then deletes; afterwards the kept
        # window must be fully resolvable and the table content unmoved
        dry_list = snapshot_vacuum(
            spark, root, keep_last=2, min_age_seconds=0, dry_run=True
        )
        from aws_logs_parquet_converter_spark.storage import storage_for_root

        _st = storage_for_root(root)
        if hasattr(_st, "list_keys"):
            _all_keys = set(_st.list_keys(root))
            dry_deleted_nothing = all(p in _all_keys for p in dry_list)
        else:
            dry_deleted_nothing = all(
                os.path.exists(os.path.join(root, p)) for p in dry_list
            )
        real_list = snapshot_vacuum(spark, root, keep_last=2, min_age_seconds=0)
        _pv_vers, pv_missing = _versions_with_all_files(spark, root, only_last=2)
        got_pv = {r.id: r.v for r in snapshot_read(spark, root).collect()}
        vacuum_ok = (
            not missing_refs
            and dry_deleted_nothing
            and set(real_list) == set(dry_list)
            and not pv_missing
            and got_pv == expected
        )
        if not vacuum_ok:
            print(
                json.dumps(
                    {
                        "vacuum_failure": {
                            "missing_refs": missing_refs[:20],
                            "dry_deleted_nothing": dry_deleted_nothing,
                            "dry_vs_real": sorted(
                                set(dry_list) ^ set(real_list)
                            )[:20],
                            "post_vacuum_missing": pv_missing[:20],
                            "post_vacuum_rows_ok": got_pv == expected,
                        }
                    }
                ),
                flush=True,
            )
        ok = ok and vacuum_ok
        if not ok:
            failed += 1
            wrong = {
                i
                for i in set(got) & set(expected)
                if got[i] != expected[i]
            }
            _forensics(
                spark,
                root,
                (set(expected) - set(got)) | wrong,
                (set(got) - set(expected)) | wrong,
            )
        else:
            import shutil

            shutil.rmtree(phys_base, ignore_errors=True)
        results.append(
            {
                "trial": trial,
                "auto_compact": bool(seed_kw),
                "committed_ops": n_commits,
                "expected_rows": len(expected),
                "got_rows": len(got),
                "versions_walked": n_vers,
                "vacuum_ok": vacuum_ok,
                "quiescent_vacuumed": len(real_list),
                "ok": ok,
                "root": None if ok else root,  # kept on disk for autopsy
                "wall_s": round(wall, 1),
            }
        )
        print(json.dumps(results[-1]), flush=True)
    spark.stop()
    total_ops = sum(r["committed_ops"] for r in results)
    print(
        json.dumps(
            {
                "probe": "commit_race",
                "trials": TRIALS,
                "procs": PROCS,
                "ops_per_proc": OPS,
                "committed_ops_total": total_ops,
                "failures": failed,
                "results": results,
            }
        )
    )
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
