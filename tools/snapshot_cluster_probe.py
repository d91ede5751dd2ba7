#!/usr/bin/env python
"""Clustered OPTIMIZE vs data skipping — does ``cluster_by`` actually
convert a stats-useless layout into a most-files-skipped one, and does
the win hold across decades? (round-6; companion to
tools/snapshot_merge_probe.py).

Fixture: a snapshot table of 1x/10x/100x rows (200k base, ~200 B/row)
committed as 8 HASH-SCRAMBLED appends (each ``repartition(4, hash_col)``)
with ``stats_cols=['id']`` — stats exist but every file spans ~the full
id range, so a range predicate can prune NOTHING. That is the layout
arrival-order or hash-partitioned ingest produces: skipping is a
property of stats TIGHTNESS, not stats existence.

Measured per decade, min-of-2 walls on local[32]:

* pruned 1%-range read BEFORE clustering — files opened (expect ALL) and
  wall (expect table-sized: every file read).
* ``snapshot_optimize(cluster_by=['id'])`` wall — the one-off
  maintenance cost that buys the layout (table-sized by design; at
  100 TB it amortizes over every subsequent range query).
* the same pruned read AFTER — files opened (expect ~1% of files,
  clamped to >=1) and wall (expect FLAT-ish across decades: bounded by
  the constant selected fraction, not table size).

The read predicate selects a constant 1% FRACTION of rows, so selected
bytes grow with the table only linearly in the selected slice — the
before/after file-count ratio is the structural measure, the after-wall
slope the honest one.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.snapshots import (
    current_version,
    read_manifest,
    snapshot_optimize,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.session import build_session

N_BASE = 200_000
N_COMMITS = 8
FILES_PER_COMMIT = 4
TARGET_FILE_MB = 16  # keeps post-pack file counts comparable across decades
DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]


def _seed(spark, root: str, n: int) -> None:
    # each commit is a STRIPE across the whole id range (ids ≡ i mod 8),
    # not a contiguous chunk — otherwise commit boundaries alone would
    # make per-file stats tight and the probe would measure the seeding
    # shape, not the clustering
    for i in range(N_COMMITS):
        df = (
            spark.range(i, n, N_COMMITS)
            .select(
                F.col("id"),
                (F.col("id") * 2).alias("v"),
                F.concat(
                    F.lit("payload_"), F.col("id"), F.lit("x" * 192)
                ).alias("s"),
            )
            # scramble on v's hash: every output file spans the commit's
            # whole id range -> per-file id stats are maximally loose
            .repartition(FILES_PER_COMMIT, "v")
        )
        snapshot_write(df, root, stats_cols=["id"])


def _timed_pruned_read(spark, root: str, hi: int) -> tuple[int, float]:
    df = snapshot_read(spark, root, filters=[("id", "<", hi)])
    n_files = len(df.inputFiles())
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return n_files, round(time.perf_counter() - t0, 2)


def main() -> None:
    spark = build_session(
        app_name="snapshot_cluster_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    results = []
    for dec in DECADES:
        n = N_BASE * dec
        hi = n // 100  # constant 1% selectivity
        row: dict = {"decade": dec, "rows": n}
        reads_b, reads_a, opt_walls = [], [], []
        for _ in range(2):
            root = tempfile.mkdtemp(prefix="cluster_probe_") + "/t"
            _seed(spark, root, n)
            m0 = read_manifest(spark, root, current_version(spark, root))
            row["files_before"] = len(m0["files"])
            reads_b.append(_timed_pruned_read(spark, root, hi))
            t0 = time.perf_counter()
            snapshot_optimize(
                spark, root, target_file_mb=TARGET_FILE_MB, cluster_by=["id"]
            )
            opt_walls.append(round(time.perf_counter() - t0, 2))
            m1 = read_manifest(spark, root, current_version(spark, root))
            row["files_after"] = len(m1["files"])
            reads_a.append(_timed_pruned_read(spark, root, hi))
            shutil.rmtree(os.path.dirname(root), ignore_errors=True)
        row["files_read_before"] = max(r[0] for r in reads_b)
        row["wall_read_before"] = min(r[1] for r in reads_b)
        row["wall_optimize"] = min(opt_walls)
        row["files_read_after"] = max(r[0] for r in reads_a)
        row["wall_read_after"] = min(r[1] for r in reads_a)
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"probe": "snapshot_cluster", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
