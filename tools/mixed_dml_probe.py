#!/usr/bin/env python
"""Snapshot-table read amplification under a MIXED DML history.

The round-6 probes priced each table feature in isolation (DV delete
cost, CDF drain, merge ∝ overlap); a real table's steady state is a
long INTERLEAVED history — appends, dv-deletes, dv-updates, the odd
OPTIMIZE. This probe builds that history (default 100 commits) under
several OPTIMIZE cadences and measures what the READ side pays:

* full-scan wall (min-of-2) of the final version,
* stats-filtered read wall + files actually opened (``inputFiles``),
* manifest footprint: live data files, deletion-vector datasets,
  total deleted-row positions the scan must anti-join away.

Variants share the exact same DML schedule (seeded), so the final
logical table is identical — asserted by row count and a value hash —
and any wall difference is pure read amplification. The cadence rule
this derives goes to SCALE.md.

Env: DML_COMMITS (default 100), DML_BATCH rows/append (default 20000),
DML_CADENCES comma list (default "0,10,25" — 0 = never), plus an
always-run "fresh" leg (one OPTIMIZE after the full history).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.session import build_session

N_COMMITS = int(os.environ.get("DML_COMMITS", "100"))
BATCH = int(os.environ.get("DML_BATCH", "20000"))
#: OPTIMIZE target; small enough that packed files GRADUATE past the
#: small-file threshold (target/2), so the incremental property is
#: visible at probe scale: later runs pack the tail, not the table
OPT_TARGET_MB = float(os.environ.get("DML_OPT_TARGET_MB", "8"))
CADENCES = [
    int(x) for x in os.environ.get("DML_CADENCES", "0,10,25").split(",")
]


def build_history(
    spark: SparkSession, root: str, cadence: int, auto: bool = False
) -> dict:
    """Drive the shared DML schedule against ``root``. Every 5th commit
    is a dv-DELETE of a thin id slice, every 7th a dv-UPDATE of another,
    the rest append BATCH rows; ``cadence`` > 0 inserts an OPTIMIZE
    after every ``cadence`` schedule steps; ``auto`` instead declares
    the auto_compact_mb table property on the first append and lets the
    WRITE PATH trigger maintenance itself. Returns commit-mix counts."""
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        current_version as current_version_of,
        read_manifest,
        snapshot_delete,
        snapshot_optimize,
        snapshot_update,
        snapshot_write,
    )

    def _mb(files):
        return sum(
            os.path.getsize(os.path.join(root, f)) for f in files
        ) / (1024 * 1024)

    mix = {
        "append": 0,
        "delete": 0,
        "update": 0,
        "optimize": 0,
        # incremental-OPTIMIZE accounting: MB actually rewritten vs the
        # table's live MB at that moment — the O(tail) vs O(table) claim
        "optimize_rewritten_mb": 0.0,
        "table_mb_at_optimize": 0.0,
    }
    next_id = 0
    for step in range(1, N_COMMITS + 1):
        if step % 7 == 0 and next_id:
            # dv-update a 200-id slice from the middle of the last batch
            lo = next_id - BATCH // 2
            snapshot_update(
                spark,
                root,
                [("id", ">=", lo), ("id", "<", lo + 200)],
                {"val": "val + 1000000"},
                mode="dv",
            )
            mix["update"] += 1
        elif step % 5 == 0 and next_id:
            # dv-delete a 200-id slice from the start of the last batch
            lo = next_id - BATCH
            snapshot_delete(
                spark,
                root,
                [("id", ">=", lo), ("id", "<", lo + 200)],
                mode="dv",
            )
            mix["delete"] += 1
        else:
            batch = spark.range(next_id, next_id + BATCH).select(
                F.col("id"),
                (F.col("id") % 365).cast("int").alias("day"),
                (F.col("id") % 9973).cast("double").alias("val"),
            )
            snapshot_write(
                batch.repartition(4),
                root,
                stats_cols=["id", "day"],
                auto_compact_mb=(
                    OPT_TARGET_MB if auto and not mix["append"] else None
                ),
            )
            next_id += BATCH
            mix["append"] += 1
        if auto and step == N_COMMITS:
            # account the auto-triggered maintenance like cadence legs:
            # count optimize actions the write path committed and sum
            # the MB each one actually rewrote
            for v in range(1, (current_version_of(spark, root) or 0) + 1):
                cur = read_manifest(spark, root, v)
                if cur["action"] != "optimize":
                    continue
                mix["optimize"] += 1
                prev = read_manifest(spark, root, v - 1)
                fresh = set(cur["files"]) - set(prev["files"])
                mix["optimize_rewritten_mb"] += round(_mb(fresh), 2)
                mix["table_mb_at_optimize"] += round(_mb(cur["files"]), 2)
        if cadence and step % cadence == 0:
            v = snapshot_optimize(spark, root, target_file_mb=OPT_TARGET_MB)
            if v is not None:
                mix["optimize"] += 1
                cur, prev = (
                    read_manifest(spark, root, v),
                    read_manifest(spark, root, v - 1),
                )
                fresh = set(cur["files"]) - set(prev["files"])
                mix["optimize_rewritten_mb"] += round(_mb(fresh), 2)
                mix["table_mb_at_optimize"] += round(_mb(cur["files"]), 2)
    mix["optimize_rewritten_mb"] = round(mix["optimize_rewritten_mb"], 2)
    mix["table_mb_at_optimize"] = round(mix["table_mb_at_optimize"], 2)
    return mix


def measure(spark: SparkSession, root: str) -> dict:
    """Read-side costs of the table's CURRENT version."""
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        current_version,
        read_manifest,
        snapshot_read,
    )

    v = current_version(spark, root)
    m = read_manifest(spark, root, v)
    dv = list(m.get("dv", ()))
    dv_rows = 0
    if dv:
        dv_rows = spark.read.parquet(
            *[os.path.join(root, p) for p in dv]
        ).count()

    def timed(fn):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            best = w if best is None or w < best else best
        return round(best, 3)

    full = snapshot_read(spark, root)
    out = {
        "version": v,
        "manifest_files": len(m["files"]),
        "dv_datasets": len(dv),
        "dv_rows": dv_rows,
        "rows": full.count(),
        # cheap order-insensitive value fingerprint: equal across variants
        "value_hash": full.agg(
            F.sum(F.hash("id", "day", "val").cast("bigint")).alias("h")
        ).collect()[0].h,
        "full_scan_s": timed(
            lambda: snapshot_read(spark, root)
            .write.mode("overwrite")
            .format("noop")
            .save()
        ),
    }
    lo = (N_COMMITS // 2) * BATCH
    filt = [("id", ">=", lo), ("id", "<", lo + BATCH)]
    out["filtered_scan_s"] = timed(
        lambda: snapshot_read(spark, root, filters=filt)
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    opened = snapshot_read(spark, root, filters=filt).inputFiles()
    out["filtered_files_opened"] = len(
        [p for p in opened if "/data/" in p]
    )
    return out


def main() -> None:
    spark = build_session(
        app_name="mixed_dml_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_optimize,
    )

    legs = [(f"cadence{c}" if c else "never", c) for c in CADENCES]
    legs.append(("auto", 0))  # property-driven: the write path maintains
    results = {}
    fresh_root = None
    for name, cadence in legs:
        root = tempfile.mkdtemp(prefix=f"dml_probe_{name}_")
        t0 = time.perf_counter()
        mix = build_history(spark, root, cadence, auto=(name == "auto"))
        row = {"commit_mix": mix, "history_s": round(time.perf_counter() - t0, 1)}
        row.update(measure(spark, root))
        results[name] = row
        print(json.dumps({"leg": name, **row}), flush=True)
        if name == "never":
            fresh_root = root  # reuse: fresh = never + one final OPTIMIZE
        else:
            shutil.rmtree(root, ignore_errors=True)
    # the freshly-OPTIMIZEd equivalent of the no-maintenance table
    t0 = time.perf_counter()
    snapshot_optimize(spark, fresh_root, target_file_mb=OPT_TARGET_MB, full=True)
    row = {"optimize_s": round(time.perf_counter() - t0, 1)}
    row.update(measure(spark, fresh_root))
    results["fresh"] = row
    print(json.dumps({"leg": "fresh", **row}), flush=True)
    shutil.rmtree(fresh_root, ignore_errors=True)

    hashes = {r["value_hash"] for r in results.values()}
    rows = {r["rows"] for r in results.values()}
    print(
        json.dumps(
            {
                "all_variants_identical": len(hashes) == 1 and len(rows) == 1,
                "rows": sorted(rows),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
