#!/usr/bin/env python
"""Manifest bytes vs stream lifetime (round-10 — the r9 VERDICT weak item).

The r9 streaming-replay ledger recorded the CUMULATIVE set of every
micro-batch id ever committed (``manifest["batch_ids"]``) and copied the
full list verbatim into every later manifest — O(stream lifetime) bytes
per commit (~25-30 MB/year of JSON on a 10 s trigger), the exact
O(history) metadata-growth class the engine's delta encoding exists to
kill. Round 10 replaced it with the scalar ``txns`` high-water mark
(Delta's SetTransaction, Armbrust VLDB'20 §3.2): one integer per stream,
flat in batch count.

This probe commits N_BATCHES (default 1000) micro-batches through the
NATIVE SINK's session-free commit core (``SnapshotTableStreamWriter`` +
``_write_task`` — one tiny parquet object and one conditional-put
manifest per batch; no SparkSession, so a thousand commits cost seconds)
and reports:

- raw DELTA manifest bytes at several lifetime points (must be FLAT —
  the steady-state commit cost),
- the counterfactual bytes the r9 cumulative list would have added at
  each point (grows linearly),
- the per-version ``snapshot_version_of_batch`` walk cost (one RAW read
  per version — task 5's rework).

Exit code 1 if delta-manifest bytes grow super-flat (> FLAT_EPS bytes
between the 5 %- and 95 %-lifetime points)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
from pyspark.sql.types import LongType, StructField, StructType

from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
    SnapshotTableStreamWriter,
    _write_task,
)
from aws_logs_parquet_converter_spark.storage import (
    current_version_fast,
    LocalSnapshotStorage,
    read_raw_manifest,
)

N_BATCHES = int(os.environ.get("LEDGER_PROBE_BATCHES", "1000"))
FLAT_EPS = 64  # allowed digit growth (version/batch numbers), no lists


def main() -> None:
    root = tempfile.mkdtemp(prefix="ledger_probe_")
    schema = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    )
    writer = SnapshotTableStreamWriter(schema, {"root": root}, overwrite=False)
    store = LocalSnapshotStorage()
    delta_bytes: dict[int, int] = {}
    t0 = time.time()
    for b in range(N_BATCHES):
        tbl = pa.table({"id": [b], "v": [b * 2]})
        msg = _write_task(writer._cfg, tbl.to_batches())
        writer.commit([msg], batchId=b)
        v = current_version_fast(store, root)
        raw = read_raw_manifest(store, root, v)
        if "base" in raw:  # delta form = the steady-state commit
            delta_bytes[b] = len(
                store.read_manifest_bytes(root, v)
            )
    wall = time.time() - t0
    pts = sorted(delta_bytes)
    sample = [
        pts[int(len(pts) * f)] for f in (0.05, 0.25, 0.5, 0.75, 0.95)
    ]
    growth = delta_bytes[sample[-1]] - delta_bytes[sample[0]]
    # counterfactual: bytes the r9 cumulative list would ADD to the same
    # manifests (the list rode EVERY commit, delta or full)
    r9_extra = {
        b: len(json.dumps(sorted(range(b + 1)))) for b in sample
    }
    out = {
        "metric": "ledger_growth_probe",
        "n_batches": N_BATCHES,
        "wall_sec": round(wall, 2),
        "delta_manifest_bytes": {str(b): delta_bytes[b] for b in sample},
        "growth_5pct_to_95pct_bytes": growth,
        "r9_cumulative_list_extra_bytes": {
            str(b): r9_extra[b] for b in sample
        },
        "flat": growth <= FLAT_EPS,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    if growth > FLAT_EPS:
        sys.exit(1)

    # --- many-apps leg (r11, r10 verdict task 6): stream_txns grows one
    # scalar per DISTINCT app id forever. Fine for real fleets (tens of
    # streams), but a misconfigured sink minting a NEW app id per
    # restart (fresh checkpoint path each run) regrows the r9 disease
    # one key at a time. Measure the per-app manifest cost so the bound
    # is a number, and prove the WARN fires at the threshold.
    many_apps_leg()


def many_apps_leg() -> None:
    from aws_logs_parquet_converter_spark.plans import snapshots as S
    from aws_logs_parquet_converter_spark.sources.snapshot_sink import (
        SnapshotTableStreamWriter,
    )

    n_apps = int(os.environ.get("LEDGER_PROBE_APPS", "512"))
    root = tempfile.mkdtemp(prefix="ledger_apps_probe_")
    schema = StructType(
        [StructField("id", LongType()), StructField("v", LongType())]
    )
    store = LocalSnapshotStorage()
    bytes_at: dict[int, int] = {}
    warned_at: int | None = None
    t0 = time.time()
    for k in range(n_apps):
        # a fresh identity per "restart" — the pathology under test
        writer = SnapshotTableStreamWriter(
            schema, {"root": root, "streamappid": f"restart-{k:05d}"},
            overwrite=False,
        )
        tbl = pa.table({"id": [k], "v": [k * 2]})
        msg = _write_task(writer._cfg, tbl.to_batches())
        writer.commit([msg], batchId=0)
        if warned_at is None and S._WARNED_MANY_STREAM_APPS:
            warned_at = k + 1
        if (k + 1) in (8, 64, 256, n_apps):
            # measure the STEADY-STATE (delta) manifest — a checkpoint
            # version's bytes are file-list-sized, not ledger-sized
            v = current_version_fast(store, root)
            if "base" not in read_raw_manifest(store, root, v):
                v -= 1
            bytes_at[k + 1] = len(store.read_manifest_bytes(root, v))
    wall = time.time() - t0
    per_app = (
        (bytes_at[n_apps] - bytes_at[8]) / (n_apps - 8)
        if n_apps > 8
        else None
    )
    out = {
        "metric": "ledger_many_apps_probe",
        "n_apps": n_apps,
        "wall_sec": round(wall, 2),
        "manifest_bytes_at_apps": {str(k): v for k, v in bytes_at.items()},
        "bytes_per_app": round(per_app, 1) if per_app else None,
        "warn_threshold": S.STREAM_APPS_WARN,
        "warned_at_apps": warned_at,
        "warn_fired": warned_at is not None,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    if warned_at is None and n_apps >= S.STREAM_APPS_WARN:
        sys.exit(1)


if __name__ == "__main__":
    main()
