#!/usr/bin/env python
"""Measured scale-growth experiment for SCALE.md (VERDICT r2 task #7).

Runs the flagship log-compaction leg and the dedup/ANN trio at
sf0.001 / sf0.01 / sf0.1 and prints one JSON line with min-of-2 wall
seconds per (query, sf) — the three points per query that turn SCALE.md's
linearity arguments into data.

Usage: python tools/scale_growth.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark import operators
from aws_logs_parquet_converter_spark.session import build_session

SFS = ["0.001", "0.01", "0.1"]
QUERIES = ["dedup_minhash_lsh", "dedup_simhash", "sim_ann_rplsh"]


def time_min_of(n: int, fn) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main() -> None:
    spark = build_session(
        app_name="scale_growth",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    queries = operators.all_queries()
    out: dict[str, dict[str, float]] = {}

    # warmup (classloading/codegen) at the smallest SF
    for q in QUERIES:
        queries[q](spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()

    for q in QUERIES:
        out[q] = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            out[q][sf] = time_min_of(
                3,
                lambda: queries[q](spark, sf_dir)
                .write.mode("overwrite")
                .format("noop")
                .save(),
            )
            spark.catalog.clearCache()

    # log compaction leg: n_lines scales with sf (same formula as bench.py)
    import glob
    import shutil
    import tempfile

    from aws_logs_parquet_converter_spark.plans.compact import (
        CompactionPolicy,
        write_compacted,
    )
    from aws_logs_parquet_converter_spark.sources.generator import write_log_files
    from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs

    # The flagship leg gets real data growth: the toy-SF query trio above is
    # overhead-dominated (fixed DAG-scheduling/codegen cost ~1-2 s dwarfs the
    # per-row cost below ~1M rows), so the log path spans two decades of
    # actual volume — 20k / 200k / 2M lines — where marginal cost is visible.
    out["log_compaction"] = {}
    for n_lines in (20_000, 200_000, 2_000_000):
        workdir = tempfile.mkdtemp(prefix="scale_logs_")
        raw, dest = os.path.join(workdir, "raw"), os.path.join(workdir, "out")
        write_log_files(raw, n_lines=n_lines, n_files=32, seed=17)
        out["log_compaction"][str(n_lines)] = time_min_of(
            3,
            lambda: write_compacted(
                read_s3_access_logs(spark, raw + "/*.txt"),
                dest,
                CompactionPolicy(num_output_files=10),
            ),
        )
        shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
