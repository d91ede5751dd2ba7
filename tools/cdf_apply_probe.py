"""Decade probe for incremental view maintenance from the change feed.

The claim behind `table_snapshot_cdf_apply`: refreshing a materialized
aggregate from snapshot_cdf row deltas costs O(changed rows), never
O(table). Measured here directly — table size grows 1x/10x/100x while the
CHANGE SET stays fixed (one dv delete + one append of ~2k rows each), and
we time (a) the incremental refresh (base-aggregate rows + cdf delta
rows re-aggregated) vs (b) the from-scratch recompute over the final
state. The incremental wall should stay flat across decades; the
recompute wall should grow with the table.

Run: python tools/cdf_apply_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.snapshots import (
    snapshot_cdf,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.session import build_session

DELTA_ROWS = 2_000


def main() -> None:
    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    for rows in (100_000, 1_000_000, 10_000_000):
        root = tempfile.mkdtemp(prefix=f"ivm_probe_{rows}_")
        base_tbl = spark.range(0, rows).selectExpr(
            "id AS k", "CAST(id % 50 AS STRING) AS grp", "id % 997 AS v"
        )
        snapshot_write(base_tbl.repartition(16), root, stats_cols=["k"])
        # the materialized view as of v1 (persisted, as a real pipeline would)
        view_dir = tempfile.mkdtemp(prefix=f"ivm_view_{rows}_")
        (
            snapshot_read(spark, root, version=1)
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .write.mode("overwrite")
            .parquet(view_dir)
        )
        # FIXED-SIZE change set regardless of table size
        snapshot_delete(spark, root, [("k", "<", DELTA_ROWS)], mode="dv")
        snapshot_write(
            spark.range(rows, rows + DELTA_ROWS).selectExpr(
                "id AS k", "CAST(id % 50 AS STRING) AS grp", "id % 997 AS v"
            ),
            root,
        )
        sign = F.when(
            F.col("_change_type") == F.lit("insert"), F.lit(1)
        ).otherwise(F.lit(-1))
        t0 = time.time()
        base = spark.read.parquet(view_dir)
        delta = (
            snapshot_cdf(spark, root, 1)
            .groupBy("grp")
            .agg(F.sum(sign).alias("n"), F.sum(sign * F.col("v")).alias("sv"))
        )
        refreshed = (
            base.unionByName(delta)
            .groupBy("grp")
            .agg(F.sum("n").alias("n"), F.sum("sv").alias("sv"))
            .where(F.col("n") > 0)
        )
        refreshed.write.mode("overwrite").format("noop").save()
        ivm_wall = time.time() - t0
        t0 = time.time()
        (
            snapshot_read(spark, root)
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        full_wall = time.time() - t0
        # exactness: incremental == recompute
        a = {r["grp"]: (r["n"], r["sv"]) for r in refreshed.collect()}
        b = {
            r["grp"]: (r["n"], r["sv"])
            for r in snapshot_read(spark, root)
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("v").alias("sv"))
            .collect()
        }
        assert a == b, f"IVM drift at {rows}"
        print(
            f"table rows={rows:>11,} delta rows={2*DELTA_ROWS:>6,} | "
            f"incremental refresh {ivm_wall:5.2f}s | from-scratch "
            f"recompute {full_wall:5.2f}s | exact: yes"
        )
    spark.stop()


if __name__ == "__main__":
    main()
