#!/usr/bin/env python
"""Decade growth probe for IVF-PQ serving (round-6 feature).

The claim behind sim_ann_ivf_pq: with nlist = ceil(sqrt(n)) coarse cells
(ivf_coarse_k) and nprobe fixed, the ADC scan per query touches only
~nprobe * n / nlist = nprobe * sqrt(n) candidates — SUBLINEAR in corpus
size — while the plain PQ-ADC scan (sim_ann_pq_adc's shape) touches all
n codes. Slopes like this have been wrong in this engine twice before
when argued instead of measured (fixed minhash bands r2, fixed RP-LSH
bits r4), so this probe measures both quantities at 1x/10x/100x the
sf0.1 embedding count (2k -> 200k vectors, deterministic xxhash64
synthesis from tools/scale_growth_synth.py):

* **candidates/query** — sum of probed-cell sizes, counted from the
  assignment + probe set alone (a groupBy-size join; no pair
  materialization), vs the full-scan count n-1.
* **serve wall** — the per-query path ONLY (probe + ADC over candidate
  codes + exact re-rank) against a FROZEN parquet index (coarse
  centroids, assignment, codebooks, codes built once per decade and
  persisted — the ivf_pq_topk injection seam), min-of-2. The full-ADC
  serve wall over the same frozen codes is timed for contrast.
* **build wall** — one-time index construction (both Lloyd's trainings
  + assign + encode), blas assign kernel; reported, not the claim.

Run: python tools/ivf_pq_scale_probe.py  (SCALE_SYNTH_DECADES=1,10 to
split). Results recorded in SCALE.md "IVF-PQ decade probe".
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

from aws_logs_parquet_converter_spark.session import build_session
from scale_growth_synth import N_VECS_BASE, synth_embeddings, time_min_of

DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]
NPROBE = 2


def main() -> None:
    spark = build_session(
        app_name="ivf_pq_scale_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from aws_logs_parquet_converter_spark.operators.similarity import (
        _ivf_probes,
        ivf_coarse_k,
        ivf_pq_topk,
        kmeans_assign,
        kmeans_train,
        pq_adc_topk,
        pq_encode,
        pq_train_codebooks,
    )

    out = []
    for dec in DECADES:
        n = N_VECS_BASE * dec
        work = tempfile.mkdtemp(prefix=f"ivfpq_probe_{dec}x_")
        try:
            emb_path = f"{work}/embeddings.parquet"
            synth_embeddings(spark, n).write.parquet(emb_path)
            em = spark.read.parquet(emb_path)
            nlist = ivf_coarse_k(n)

            t0 = time.perf_counter()
            cents = kmeans_train(em, k=nlist, n_iters=2, impl="blas")
            assigned = kmeans_assign(em, cents, impl="blas").select(
                "vec_id", "cluster"
            )
            assigned.write.parquet(f"{work}/assign")
            cents.write.parquet(f"{work}/cents")
            cb = pq_train_codebooks(em, k=16, n_iters=3)
            cb.write.parquet(f"{work}/cb")
            pq_encode(em, spark.read.parquet(f"{work}/cb")).write.parquet(
                f"{work}/codes"
            )
            build_s = round(time.perf_counter() - t0, 3)

            cents_r = spark.read.parquet(f"{work}/cents")
            assigned_r = spark.read.parquet(f"{work}/assign")
            cb_r = spark.read.parquet(f"{work}/cb")
            codes_r = spark.read.parquet(f"{work}/codes")

            # candidates per query = sum of probed-cell sizes, from
            # metadata-sized frames (nlist rows x n_queries probes); the
            # probe set comes from the SAME helper serving uses, so the
            # count can't desynchronize from what the scan touches
            sizes = assigned_r.groupBy("cluster").count()
            probes = _ivf_probes(em, cents_r, n_queries=8, nprobe=NPROBE)
            cand_total = (
                probes.join(sizes, "cluster").agg(F.sum("count")).collect()[0][0]
            )
            cand_per_q = int(cand_total / 8)

            serve_s = time_min_of(
                2,
                lambda: ivf_pq_topk(
                    em, nprobe=NPROBE, coarse=cents_r, assigned=assigned_r,
                    codebook=cb_r, codes=codes_r,
                ).write.mode("overwrite").format("noop").save(),
            )
            full_adc_s = time_min_of(
                2,
                lambda: pq_adc_topk(
                    em, codebook=cb_r, codes=codes_r
                ).write.mode("overwrite").format("noop").save(),
            )
            row = {
                "decade": dec,
                "n": n,
                "nlist": nlist,
                "nprobe": NPROBE,
                "cand_per_query": cand_per_q,
                "full_scan_per_query": n - 1,
                "scan_fraction": round(cand_per_q / n, 4),
                "serve_wall_s": serve_s,
                "full_adc_wall_s": full_adc_s,
                "build_wall_s": build_s,
            }
            out.append(row)
            print(json.dumps(row))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "ivf_pq_scale", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
