#!/usr/bin/env python
"""OPTIMIZE at metadata scale: the ~1000-partition fragmented table probe
(VERDICT r4 task #3c).

A decade-long day-partitioned lake is ~3650 partitions; streaming ingest
fragments each into per-batch files. This probe synthesizes a table with
N_PARTS day partitions x FILES_PER small files (one Spark job — the
fragmentation comes from a (day, batch) dynamic-overwrite write, the same
layout the streaming path commits), then measures:

* the driver-side metadata sweep (partition_file_stats) — must be seconds,
  not minutes, at O(1) bridge calls per partition;
* selection (pure python over the stats);
* the rewrite wall SEQUENTIAL (max_concurrency=1) vs CONCURRENT (8
  threads) over the same fragmentation — the r4 verdict nit: per-partition
  jobs must not serialize into N_PARTS job-submission walls.

Rows are tiny on purpose: at this partition count the cost under test is
per-job/py4j/filesystem OVERHEAD, which is exactly what dominates a real
3650-partition sweep whose per-partition data fits one task.
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

from aws_logs_parquet_converter_spark.plans.optimize import (
    optimize_partitions,
    partition_file_stats,
    select_partitions_to_optimize,
)
from aws_logs_parquet_converter_spark.session import build_session

N_PARTS = int(os.environ.get("OPT_PROBE_PARTS", "1000"))
FILES_PER = 5
ROWS_PER_FILE = 50


def seed(spark, dest: str) -> None:
    """N_PARTS day partitions, each fragmented into FILES_PER batch files
    — written as FILES_PER dynamic-overwrite passes, mirroring streaming
    ingest commits."""
    n = N_PARTS * FILES_PER * ROWS_PER_FILE
    base = (
        spark.range(n)
        .withColumn("day", (F.col("id") % N_PARTS).cast("int"))
        .withColumn("batch", ((F.col("id") / N_PARTS).cast("long") % FILES_PER))
        .withColumn("v", F.xxhash64("id").cast("double") / 1e18)
    )
    (
        base.repartition("day", "batch")
        .write.mode("overwrite")
        .partitionBy("day", "batch")
        .parquet(dest)
    )


def main() -> None:
    spark = build_session(
        app_name="optimize_scale_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    dest = tempfile.mkdtemp(prefix="opt_probe_")
    out: dict = {"n_parts": N_PARTS, "files_per": FILES_PER}
    try:
        t0 = time.perf_counter()
        seed(spark, dest)
        out["seed_sec"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        stats = partition_file_stats(spark, dest, "day")
        out["metadata_sweep_sec"] = round(time.perf_counter() - t0, 2)
        out["partitions_seen"] = len(stats)
        out["files_seen"] = sum(p.n_files for p in stats)

        t0 = time.perf_counter()
        picked = select_partitions_to_optimize(stats, target_file_mb=128)
        out["selection_sec"] = round(time.perf_counter() - t0, 3)
        out["selected"] = len(picked)

        n_before = spark.read.parquet(dest).count()

        # sequential rewrite over the first half of the partitions, then
        # concurrent over the (identically fragmented) second half — same
        # work, one variable
        halves = {}
        for label, conc in (("sequential", 1), ("concurrent8", 8)):
            t0 = time.perf_counter()
            done = optimize_partitions(
                spark,
                dest,
                "day",
                target_file_mb=128,
                collapse=("batch", "-1"),
                max_concurrency=conc,
            )
            halves[label] = {
                "wall_sec": round(time.perf_counter() - t0, 2),
                "rewritten": len(done),
            }
            if label == "sequential":
                # re-fragment for the concurrent pass: second seed round
                seed(spark, dest)
        out["rewrite"] = halves
        out["rows_preserved"] = spark.read.parquet(dest).count() == n_before
        after = partition_file_stats(spark, dest, "day")
        out["max_files_after"] = max(p.n_files for p in after)
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
