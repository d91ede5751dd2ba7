#!/usr/bin/env python
"""Round-12 phase profiler: breaks the expensive bench legs into their
constituent phases and times each (guide §1 — measure first, isolate with
the noop sink). Run AFTER the suite is idle; results feed
OPTIMIZATION_r12.md's before tables.

Usage: python tools/r12_profile.py [kmeans|stream|headline] ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def calibration() -> float:
    import hashlib
    import time as _t

    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        h = b"\x00" * 32
        for i in range(400_000):
            h = hashlib.sha256(h + i.to_bytes(4, "little")).digest()
        xs = [(i * 2654435761) & 0xFFFFFFFF for i in range(2_000_000)]
        xs.sort()
        best = min(best, _t.perf_counter() - t0)
    return round(best, 3)


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def timed(spark, label, fn, n=3):
    best = float("inf")
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{best:8.3f}  {label}", flush=True)
    return best


def profile_kmeans(spark):
    from aws_logs_parquet_converter_spark.catalog import load_table
    from aws_logs_parquet_converter_spark.operators import similarity as S

    e = load_table(spark, SF_DIR, "embeddings")
    timed(spark, "km: count()", lambda: e.count())
    n = e.count()
    k_coarse = S.ivf_coarse_k(n)
    k_sem = S.semantic_k(n)
    print(f"n={n} k_coarse={k_coarse} k_sem={k_sem}")

    timed(spark, "km: kmeans_train coarse k=%d iters=2" % k_coarse,
          lambda: S.kmeans_train(e, k=k_coarse, n_iters=2))
    cents = S.kmeans_train(e, k=k_coarse, n_iters=2)
    timed(spark, "km: kmeans_assign", lambda: noop(S.kmeans_assign(e, cents)))
    timed(spark, "km: pq_train_codebooks k=16 iters=3",
          lambda: S.pq_train_codebooks(e, k=16, n_iters=3))
    cb = S.pq_train_codebooks(e, k=16, n_iters=3)
    timed(spark, "km: pq_encode", lambda: noop(S.pq_encode(e, cb)))
    assigned = S.kmeans_assign(e, cents).select("vec_id", "cluster").localCheckpoint()
    codes = S.pq_encode(e, cb).localCheckpoint()
    timed(spark, "km: ivf_pq query path (injected index)",
          lambda: noop(S.ivf_pq_topk(e, coarse=cents, assigned=assigned,
                                     codebook=cb, codes=codes)))
    timed(spark, "km: sim_ann_ivf_pq FULL", lambda: noop(S.sim_ann_ivf_pq(spark, SF_DIR)))

    timed(spark, "km: kmeans_train sem k=%d iters=2" % k_sem,
          lambda: S.kmeans_train(e, k=k_sem, n_iters=2))
    sem_cents = S.kmeans_train(e, k=k_sem, n_iters=2)
    asg = S.kmeans_assign(e, sem_cents).localCheckpoint()
    timed(spark, "km: semantic pair+keep (post-assign)", lambda: noop(
        _semantic_tail(asg)))
    timed(spark, "km: dedup_semantic_clustered FULL",
          lambda: noop(S.dedup_semantic_clustered(spark, SF_DIR)))
    timed(spark, "km: sim_outlier_cluster FULL",
          lambda: noop(S.sim_outlier_cluster(spark, SF_DIR)))
    timed(spark, "km: dedup_incremental_semantic FULL",
          lambda: noop(S.dedup_incremental_semantic(spark, SF_DIR)))


def _semantic_tail(assigned, threshold=0.35):
    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.operators.similarity import dot

    a = assigned.alias("a")
    b = assigned.alias("b")
    dup_ids = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(
            dot(F.col("a.emb"), F.col("b.emb"))
            >= F.lit(threshold) * F.col("a.nrm") * F.col("b.nrm")
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    return assigned.join(dup_ids, "vec_id", "left").select(
        "vec_id", "cluster",
        F.coalesce(~F.col("__dup"), F.lit(True)).alias("keep"),
    )


def profile_stream(spark):
    import tempfile

    from aws_logs_parquet_converter_spark.operators.logetl import RAW_LINES
    from aws_logs_parquet_converter_spark.streaming import events as E

    # per-micro-batch fixed cost: the same 4-file corpus at 1/4/16 files
    # per trigger → slope = per-batch cost, intercept = per-run cost
    for mfpt in (1, 4):
        def run(mfpt=mfpt):
            raw = E._write_line_files(RAW_LINES, 4, f"prof_stream{mfpt}_")
            dest = tempfile.mkdtemp(prefix=f"prof_dest{mfpt}_")
            E.run_log_file_stream(spark, raw, dest, max_files_per_trigger=mfpt)
        timed(spark, f"st: run_log_file_stream mfpt={mfpt} (4 files)", run)

    timed(spark, "st: stream_dedup FULL",
          lambda: noop(E.stream_dedup_events(spark, SF_DIR)))
    timed(spark, "st: stream_rate_limited_source FULL",
          lambda: noop(E.stream_rate_limited_source(spark, SF_DIR)))
    timed(spark, "st: stream_cdf_materialized_view FULL",
          lambda: noop(E.stream_cdf_materialized_view(spark, SF_DIR)))
    timed(spark, "st: stream_snapshot_compaction FULL",
          lambda: noop(E.stream_snapshot_compaction(spark, SF_DIR)))
    timed(spark, "st: stream_snapshot_cdf FULL",
          lambda: noop(E.stream_snapshot_cdf(spark, SF_DIR)))
    timed(spark, "st: stream_snapshot_source FULL",
          lambda: noop(E.stream_snapshot_source(spark, SF_DIR)))


def profile_jobs(spark):
    """Noise-free structural metric: #jobs / #stages / #tasks per leg."""
    from aws_logs_parquet_converter_spark.operators import similarity as S

    st = spark.sparkContext.statusTracker()

    def count(label, fn):
        before_jobs = set(st.getJobIdsForGroup(None) or [])
        before_stages = set(st.getActiveStageIds() or [])
        fn()
        jobs = [j for j in (st.getJobIdsForGroup(None) or []) if j not in before_jobs]
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = st.getJobInfo(j)
            if ji is None:
                continue
            for sid in ji.stageIds:
                si = st.getStageInfo(sid)
                if si is not None and si.numCompletedTasks > 0:
                    n_stages += 1
                    n_tasks += si.numCompletedTasks
        print(f"jobs={len(jobs):3d} stages={n_stages:3d} tasks={n_tasks:5d}  {label}",
              flush=True)

    count("sim_ann_ivf_pq", lambda: noop(S.sim_ann_ivf_pq(spark, SF_DIR)))
    count("dedup_semantic_clustered",
          lambda: noop(S.dedup_semantic_clustered(spark, SF_DIR)))
    count("sim_outlier_cluster", lambda: noop(S.sim_outlier_cluster(spark, SF_DIR)))
    count("sim_ivf_assign", lambda: noop(S.sim_ivf_assign(spark, SF_DIR)))
    count("dedup_incremental_semantic",
          lambda: noop(S.dedup_incremental_semantic(spark, SF_DIR)))


def main():
    which = set(sys.argv[1:]) or {"kmeans", "stream"}
    spark = build_session(
        app_name="r12_profile",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    # warmup
    from aws_logs_parquet_converter_spark.catalog import load_table

    load_table(spark, WARM, "embeddings").count()
    print(f"calibration_start {calibration()}", flush=True)
    if "kmeans" in which:
        profile_kmeans(spark)
    if "jobs" in which:
        profile_jobs(spark)
    if "stream" in which:
        profile_stream(spark)
    print(f"calibration_end {calibration()}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()


