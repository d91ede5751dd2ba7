#!/usr/bin/env python
"""Incremental PQ maintenance vs full rebuild — the day-2 cost gap
(round-5; the sim_ann_pq_append analog of tools/incremental_cost_probe.py).

A daily-ingest retrieval pipeline has two choices when vectors arrive:
re-run the whole build (train codebooks + encode everything) or encode
just the batch against frozen codebooks and append
(``similarity.pq_append_batch``). This probe measures both at 10x/100x
the sf0.1 embeddings row count (20k / 200k vectors, 1%% daily batch,
synthetic xxhash64 corpus — scale_growth_synth.synth_embeddings),
min-of-2 on local[32]:

* ``build_full``    — pq_train_codebooks (3 Lloyd's iterations) +
                      pq_encode over ALL vectors, persisted.
* ``append_batch``  — pq_encode of the 1%% batch against the FROZEN
                      persisted codebooks + parquet append.
* ``serve_topk``    — ADC top-k from the persisted index (unchanged by
                      which maintenance path produced it).

The structural claim this turns into numbers: append cost is O(|batch|)
(one broadcast join + hash aggregate over batch rows) while the rebuild
re-pays 3 training shuffles + a full-corpus encode — so the gap widens
linearly with corpus/batch ratio."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.operators.similarity import (
    build_pq_index,
    pq_adc_topk,
    pq_append_batch,
)
from aws_logs_parquet_converter_spark.session import build_session
from scale_growth_synth import N_VECS_BASE, synth_embeddings, time_min_of

DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "10,100").split(",")
]
BATCH_FRAC = 100  # 1% daily batch


def main() -> None:
    spark = build_session(
        app_name="pq_append_cost_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    out: dict = {"batch_frac": f"1/{BATCH_FRAC}"}
    root = tempfile.mkdtemp(prefix="pq_cost_")
    try:
        for dec in DECADES:
            n = N_VECS_BASE * dec
            key = f"x{dec} ({n} vecs)"
            vdir = f"{root}/v{dec}"
            synth_embeddings(spark, n).write.mode("overwrite").parquet(vdir)
            vecs = spark.read.parquet(vdir)
            cut = n - n // BATCH_FRAC
            old = vecs.where(F.col("vec_id") < cut)
            batch = vecs.where(F.col("vec_id") >= cut)

            def full_build():
                build_pq_index(vecs, f"{root}/full{dec}")

            def day1_build():
                build_pq_index(old, f"{root}/idx{dec}")

            t_full = time_min_of(2, full_build)
            day1_build()  # day-1 state for the append leg (untimed baseline)

            def append():
                # fresh codes copy per run so appends don't accumulate
                shutil.rmtree(f"{root}/run{dec}", ignore_errors=True)
                shutil.copytree(f"{root}/idx{dec}", f"{root}/run{dec}")
                pq_append_batch(spark, f"{root}/run{dec}", batch)

            t_append = time_min_of(2, append)

            def serve():
                pq_adc_topk(
                    vecs,
                    codebook=spark.read.parquet(f"{root}/run{dec}/codebook"),
                    codes=spark.read.parquet(f"{root}/run{dec}/codes"),
                ).write.mode("overwrite").format("noop").save()

            t_serve = time_min_of(2, serve)
            out[key] = {
                "rebuild_full_sec": t_full,
                "append_batch_sec": t_append,
                "serve_topk_sec": t_serve,
                "speedup": round(t_full / t_append, 1),
            }
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
