#!/usr/bin/env python
"""Min-of-5 rerun of the BENCH_r03 legs that moved >10% vs r02, to separate
noise from real regressions (VERDICT r3 task 2). Same harness as bench.py
(warmup at sf0.001, noop writes, cache cleared between passes)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark import operators
from aws_logs_parquet_converter_spark.session import build_session

SUSPECTS = [
    "dedup_embedding_cosine",
    "q_sketch_rollup",
    "sim_topk_bruteforce",
    "text_repetition",
    "text_top_terms",
    "sim_ivf_assign",
]

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="regression_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    queries = operators.all_queries()
    for name in SUSPECTS:
        queries[name](spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for _pass in range(5):
        for name in SUSPECTS:
            df = queries[name](spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            el = round(time.perf_counter() - t0, 3)
            if name not in timings or el < timings[name]:
                timings[name] = el
        spark.catalog.clearCache()

    # log_compaction, min-of-5 (bench uses min-of-2)
    from aws_logs_parquet_converter_spark.plans.compact import CompactionPolicy, write_compacted
    from aws_logs_parquet_converter_spark.sources.generator import write_log_files
    from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs

    workdir = tempfile.mkdtemp(prefix="probe_logs_")
    raw = os.path.join(workdir, "raw")
    out = os.path.join(workdir, "out")
    write_log_files(raw, n_lines=200_000, n_files=32, seed=17)
    for _pass in range(5):
        t0 = time.perf_counter()
        write_compacted(
            read_s3_access_logs(spark, raw + "/*.txt"), out,
            CompactionPolicy(num_output_files=10),
        )
        el = round(time.perf_counter() - t0, 3)
        if "log_compaction" not in timings or el < timings["log_compaction"]:
            timings["log_compaction"] = el
    shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
