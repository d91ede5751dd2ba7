#!/usr/bin/env python
"""Incremental-dedup cost probe (numbers cited in SCALE.md round-4).

Synthesizes the x100 corpus (500k docs), builds the persisted band index
for the first 99%, then times one "day": the 1%-batch index probe
(dedup_incremental_minhash shape) vs the full-corpus recompute
(dedup_minhash_lsh). Prints one JSON line.

Usage: python tools/incremental_cost_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.operators.dedup import (
    build_band_index,
    incremental_minhash_pairs,
    minhash_lsh_pairs,
)
from aws_logs_parquet_converter_spark.session import build_session
from tools.scale_growth_synth import synth_documents

N = 500_000
BATCH_FRACTION = 0.01


def main() -> None:
    spark = build_session(
        app_name="incremental_cost_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    docs_path = tempfile.mkdtemp(prefix="incr_cost_") + "/documents.parquet"
    synth_documents(spark, N).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    split = int(N * (1 - BATCH_FRACTION))
    idx = tempfile.mkdtemp(prefix="incr_cost_band_index_")

    t0 = time.perf_counter()
    build_band_index(docs, idx, split=split)
    t_build = round(time.perf_counter() - t0, 2)

    def tmin(fn, n=2):
        best = None
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 2)

    batch = docs.where(F.col("doc_id") >= split)
    t_incr = tmin(
        lambda: incremental_minhash_pairs(spark, batch, idx)
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    t_full = tmin(
        lambda: minhash_lsh_pairs(docs).write.mode("overwrite").format("noop").save()
    )
    print(
        json.dumps(
            {
                "corpus": N,
                "batch": N - split,
                "build_index_once_sec": t_build,
                "incremental_probe_sec": t_incr,
                "full_recompute_sec": t_full,
                "ratio": round(t_full / t_incr, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
