#!/usr/bin/env python
"""Copy-on-write MERGE cost vs table size — does stats pruning actually
buy the "merge cost ∝ overlapping-file bytes, not table bytes" claim?
(round-6; the snapshot-table analog of tools/incremental_cost_probe.py).

Fixture: a snapshot table committed as 8 disjoint-key-range appends,
each ``repartitionByRange(4)`` so per-file min/max key stats are tight —
the shape time-ordered ingest produces naturally (and the shape the
streaming snapshot commit writes per micro-batch). A CONSTANT change-set
(2,000 upserts confined to the first commit's key range) merges into
tables of 1x/10x/100x rows (200k base), min-of-2 walls on local[32],
two table variants:

* ``stats``    — committed with ``stats_cols=['id']``: candidate files
                 are pruned driver-side from manifest min/max; only the
                 files overlapping the change-set's key range are read
                 and rewritten. Expected wall: FLAT across decades.
* ``no_stats`` — same data, no stats: every file is a candidate, the
                 whole table is read + rewritten. Expected wall: LINEAR
                 in table size. This is what MERGE costs on a plain
                 parquet table, and the contrast IS the feature.

Reported per decade: rows, total files, files rewritten (manifest diff),
and both walls.
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
    snapshot_merge,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.session import build_session

N_BASE = 200_000
N_COMMITS = 8
FILES_PER_COMMIT = 4
CHANGE_ROWS = 2_000
DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]


def _seed(spark, root: str, n: int, with_stats: bool) -> None:
    chunk = n // N_COMMITS
    for i in range(N_COMMITS):
        df = (
            spark.range(i * chunk, (i + 1) * chunk)
            .select(
                F.col("id"),
                (F.col("id") * 2).alias("v"),
                # ~200 B/row so REWRITE BYTES dominate the wall at decade
                # 100 (4 GB table) — at short payloads the per-job fixed
                # cost swamps the read-everything term and both variants
                # time identically (first probe run; kept honest here)
                F.concat(
                    F.lit("payload_"), F.col("id"), F.lit("x" * 192)
                ).alias("s"),
            )
            .repartitionByRange(FILES_PER_COMMIT, "id")
        )
        snapshot_write(df, root, stats_cols=["id"] if with_stats else None)


def main() -> None:
    spark = build_session(
        app_name="snapshot_merge_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    results = []
    for dec in DECADES:
        n = N_BASE * dec
        row: dict = {"decade": dec, "rows": n}
        # constant change-set: upserts confined to [0, CHANGE_ROWS * 4)
        # — inside the FIRST commit's key range at every decade
        src = spark.range(0, CHANGE_ROWS * 4, 4).select(
            F.col("id"),
            (F.col("id") * 9).alias("v"),
            F.lit("merged").alias("s"),
        )
        for variant, with_stats in (("stats", True), ("no_stats", False)):
            walls = []
            for _ in range(2):
                root = tempfile.mkdtemp(prefix=f"merge_probe_{variant}_") + "/t"
                _seed(spark, root, n, with_stats)
                before = set(
                    read_manifest(spark, root, current_version(spark, root))[
                        "files"
                    ]
                )
                t0 = time.perf_counter()
                snapshot_merge(src, root, key="id")
                walls.append(round(time.perf_counter() - t0, 2))
                after = set(
                    read_manifest(spark, root, current_version(spark, root))[
                        "files"
                    ]
                )
                row[f"files_total_{variant}"] = len(before)
                row[f"files_rewritten_{variant}"] = len(before - after)
                shutil.rmtree(os.path.dirname(root), ignore_errors=True)
            row[f"wall_{variant}"] = min(walls)
        results.append(row)
        print(json.dumps(row))
    print(json.dumps({"probe": "snapshot_merge", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
