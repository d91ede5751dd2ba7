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

    # --- recall@10 vs nprobe (r12 verdict #3): the nprobe=2 default as
    # a MEASURED point on the recall/latency curve, not a fixture
    # artifact. Two corpora: the real sf0.1 embeddings table (what the
    # registry queries serve) and the 100x synthetic decade (200k
    # vectors — the scale the sqrt rule is for). Ground truth = exact
    # brute-force cosine top-10 over the same queries.
    from aws_logs_parquet_converter_spark.operators.similarity import (
        brute_force_topk,
    )

    def _recall_curve(em, n, label, planted=False):
        work = tempfile.mkdtemp(prefix=f"ivfpq_recall_{label}_")
        emb_path = f"{work}/emb"
        em.write.parquet(emb_path)
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
        build_s = round(time.perf_counter() - t0, 2)
        cents_r = spark.read.parquet(f"{work}/cents")
        assigned_r = spark.read.parquet(f"{work}/assign")
        cb_r = spark.read.parquet(f"{work}/cb")
        codes_r = spark.read.parquet(f"{work}/codes")
        nq, kk = 40, 10
        truth = {
            (r["query_id"], r["neighbor_id"])
            for r in brute_force_topk(
                em, em.where(F.col("vec_id") < nq), k=kk
            ).collect()
        }
        # planted near-dup pairs inside the query window (synth corpora:
        # id%10==1 is a cos>=0.999 twin of id-1) — the band the operator
        # contractually serves; mid-band recall on an UNSTRUCTURED
        # corpus is low by design (neighbors at cos~0.3 scatter across
        # cells; the same honesty note as test_midband_recall_window)
        twins = (
            [
                (q, q - 1 if q % 10 == 1 else q + 1)
                for q in range(nq)
                if q % 10 in (0, 1)
                and 0 <= (q - 1 if q % 10 == 1 else q + 1) < n
            ]
            if planted
            else []  # real testdata embeddings plant no twins
        )
        rows = []
        for nprobe in (1, 2, 4, 8):
            t0 = time.perf_counter()
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in ivf_pq_topk(
                    em, n_queries=nq, k=kk, shortlist=100, nprobe=nprobe,
                    coarse=cents_r, assigned=assigned_r,
                    codebook=cb_r, codes=codes_r,
                ).collect()
            }
            wall = round(time.perf_counter() - t0, 2)
            rec = round(len(got & truth) / len(truth), 3)
            twin_rec = (
                round(sum(1 for p in twins if p in got) / len(twins), 3)
                if twins
                else None
            )
            rows.append(
                {
                    "corpus": label, "n": n, "nlist": nlist,
                    "nprobe": nprobe, "recall_at_10": rec,
                    "planted_twin_recall": twin_rec,
                    "serve_wall_s": wall, "build_wall_s": build_s,
                }
            )
            print(json.dumps(rows[-1]), flush=True)
        shutil.rmtree(work, ignore_errors=True)
        return rows

    curve = []
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_sf = emb.count()
    curve += _recall_curve(emb, n_sf, "sf0.1")
    if 100 in DECADES:
        n_big = N_VECS_BASE * 100
        curve += _recall_curve(
            synth_embeddings(spark, n_big).select("vec_id", "embedding"),
            n_big,
            "synth100x",
            planted=True,
        )
    # pinned at the LARGER scale (the floors the nprobe=2 default rests
    # on): the PLANTED near-dup band — the operator's contract — must
    # retrieve, and brute-force recall must be monotone in nprobe (the
    # dial works). Mid-band absolute recall on unstructured corpora is
    # published, not pinned: it is low by design (see honesty note).
    by_np = {
        r["nprobe"]: r for r in curve if r["corpus"] == "synth100x"
    }
    if by_np:
        assert by_np[2]["planted_twin_recall"] >= 0.75, by_np[2]
        rs = [by_np[p]["recall_at_10"] for p in (1, 2, 4, 8)]
        assert all(b >= a - 0.05 for a, b in zip(rs, rs[1:])), rs
    print(json.dumps({"probe": "ivf_pq_recall_curve", "rows": curve}))
    spark.stop()


if __name__ == "__main__":
    main()
