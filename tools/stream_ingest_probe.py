#!/usr/bin/env python
"""Streaming vs batch log compaction at volume (round-5).

The streaming path (`run_log_file_stream`) replaces the reference's daily
batch driver with arrival-driven micro-batches, each committed with an
idempotent (day, batch) dynamic partition overwrite. This probe prices
that trade at real line volume: N_LINES synthetic S3 access-log lines
split over N_FILES files, drained one-file-per-micro-batch, vs the batch
path (`write_compacted`) over the same corpus in one job — min-of-2,
local[32]. Also reports per-micro-batch wall (total / N_FILES) and the
rows-match check between the two outputs.

What the number means at scale: the streaming path pays one Spark job +
one dynamic-overwrite commit per arriving file. For the reference's
many-tiny-objects pathology the batch path amortizes that over thousands
of files, so continuous ingest costs a multiple of batch throughput —
the price of per-file latency — while staying linear in file count.
Tune with maxFilesPerTrigger when latency budgets allow batching
arrivals."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.plans.compact import (
    CompactionPolicy,
    write_compacted,
)
from aws_logs_parquet_converter_spark.session import build_session
from aws_logs_parquet_converter_spark.sources.generator import write_log_files
from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs
from aws_logs_parquet_converter_spark.streaming.events import run_log_file_stream

N_LINES = int(os.environ.get("STREAM_PROBE_LINES", "200000"))
N_FILES = int(os.environ.get("STREAM_PROBE_FILES", "16"))


def main() -> None:
    spark = build_session(
        app_name="stream_ingest_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    root = tempfile.mkdtemp(prefix="stream_probe_")
    raw = os.path.join(root, "raw")
    write_log_files(raw, n_lines=N_LINES, n_files=N_FILES, seed=23)
    out: dict = {"n_lines": N_LINES, "n_files": N_FILES}
    try:
        # warm both paths on a small slice
        small = os.path.join(root, "raw_small")
        write_log_files(small, n_lines=2000, n_files=2, seed=5)
        run_log_file_stream(spark, small, os.path.join(root, "w1"))
        write_compacted(
            read_s3_access_logs(spark, small + "/*.txt"),
            os.path.join(root, "w2"),
            CompactionPolicy(num_output_files=2),
        )

        best_b = best_s = None
        for i in range(2):
            bdest = os.path.join(root, f"batch{i}")
            t0 = time.perf_counter()
            write_compacted(
                read_s3_access_logs(spark, raw + "/*.txt"),
                bdest,
                CompactionPolicy(target_file_mb=128),
            )
            dt = time.perf_counter() - t0
            best_b = dt if best_b is None else min(best_b, dt)

            sdest = os.path.join(root, f"stream{i}")
            t0 = time.perf_counter()
            run_log_file_stream(spark, raw, sdest)
            dt = time.perf_counter() - t0
            best_s = dt if best_s is None else min(best_s, dt)
        out["batch_wall_sec"] = round(best_b, 2)
        out["stream_wall_sec"] = round(best_s, 2)
        out["per_microbatch_sec"] = round(best_s / N_FILES, 2)
        out["stream_over_batch"] = round(best_s / best_b, 2)
        n_b = spark.read.parquet(os.path.join(root, "batch1")).count()
        n_s = spark.read.parquet(os.path.join(root, "stream1")).count()
        out["rows_match"] = bool(n_b == n_s)
        out["rows"] = n_s
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
