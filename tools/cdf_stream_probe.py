#!/usr/bin/env python
"""Change-feed drain cost vs table size (round-6, stream_snapshot_cdf).

The claim: consuming the snapshot change feed costs O(vector-touched
file bytes) per micro-batch — NEVER O(table) — because inserts plan
only fresh files and delete/update images plan only vector-touched
positions. This probe seeds RANGE-CLUSTERED tables at 1x/10x/100x
(100k -> 10M rows), checkpoints a change-feed stream past the seed,
then commits a FIXED-SIZE clustered change set (a 1000-row range
dv-delete + a 500-row tail dv-update — each touching O(1) files) and
times the incremental drain. If the feed were table-bound the drain
wall would grow 100x across the decades; touched-bytes predicts a flat
wall. (A SCATTERED change set degrades to all-files-touched — the same
read tax dv_cost_probe measures for reads; clustering is what keeps
both the feed and the read path cheap, which is exactly why OPTIMIZE
cluster_by exists.)

Run: python tools/cdf_stream_probe.py   (SCALE_SYNTH_DECADES=1,10 to
split). Results recorded in SCALE.md "Change-feed drain cost".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.session import build_session

DECADES = [
    int(x) for x in os.environ.get("SCALE_SYNTH_DECADES", "1,10,100").split(",")
]
N_BASE = 100_000
DEL_CAP = 1_000  # clustered range delete: id < DEL_CAP, O(1) files touched
UPD_ROWS = 500


def _drain(spark, root, dest, ckpt) -> float:
    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        register_snapshot_stream_source,
    )

    register_snapshot_stream_source(spark)
    t0 = time.perf_counter()
    q = (
        spark.readStream.format("snapshot_table")
        .option("root", root)
        .option("changefeed", "true")
        .load()
        .writeStream.format("parquet")
        .option("path", dest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    spark = build_session(
        app_name="cdf_stream_probe",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "24g"},
    )
    from pyspark.sql import functions as F

    from aws_logs_parquet_converter_spark.plans.snapshots import (
        snapshot_delete,
        snapshot_update,
        snapshot_write,
    )

    out = []
    for dec in DECADES:
        n = N_BASE * dec
        work = tempfile.mkdtemp(prefix=f"cdf_stream_{dec}x_")
        try:
            root = f"{work}/t"
            rows = spark.range(n).select(
                F.col("id"),
                (F.col("id") % 97).alias("uid"),
                F.sha2(F.col("id").cast("string"), 256).alias("payload"),
            )
            snapshot_write(
                rows.repartitionByRange(max(4, dec * 4), "id"),
                root,
                stats_cols=["id"],
            )
            # checkpoint PAST the seed so the timed drain sees only changes
            # (one dest for both drains: the parquet sink's metadata log is
            # keyed by the checkpoint's batch ids)
            seed_s = _drain(spark, root, f"{work}/dest", f"{work}/ckpt")
            # fixed-size clustered change set: O(1) files touched at any n
            del_v = snapshot_delete(
                spark, root, [("id", "<", DEL_CAP)], mode="dv"
            )
            upd_v = snapshot_update(
                spark,
                root,
                [("id", ">=", n - UPD_ROWS)],
                {"uid": "uid + 1000"},
                mode="dv",
            )
            assert del_v and upd_v
            inc_s = _drain(spark, root, f"{work}/dest", f"{work}/ckpt")
            got = spark.read.parquet(f"{work}/dest")
            n_changes = got.where("_commit_version >= 2").count()
            row = {
                "decade": dec,
                "n": n,
                "changed_rows": n_changes,
                "seed_drain_s": seed_s,
                "incremental_drain_s": inc_s,
            }
            out.append(row)
            print(json.dumps(row))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({"probe": "cdf_stream", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
