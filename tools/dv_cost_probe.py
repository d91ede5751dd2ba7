"""Decade probe: deletion-vector DELETE vs copy-on-write DELETE.

The claim behind `snapshot_delete(mode="dv")`: for a SMALL delete
scattered across every file (the GDPR-erasure shape — min/max stats
cannot prune a predicate on a scattered column), copy-on-write rewrites
the whole overlap (here: the whole table) while the vector write costs
O(matching rows). Measured at 1x/10x/100x table size with the match
count held ~fixed (~1000 rows): the cow wall should grow with the table,
the dv wall should stay ~flat; reads after each are timed too (the dv
read pays the anti-join; OPTIMIZE purges it back).

Run: python tools/dv_cost_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.snapshots import (
    read_manifest,
    snapshot_delete,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.session import build_session


def main() -> None:
    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
        },
    )
    for rows, n_files in ((400_000, 8), (2_000_000, 16), (10_000_000, 32)):
        # 'tag' hits ~1000 rows spread over EVERY file: stats on k prune
        # nothing for a tag predicate, so cow's overlap = the whole table.
        # payload makes rows log-shaped (~150 B) so the rewrite pays real
        # bytes, not just task overhead — the quantity that grows at 100 TB
        step = rows // 1000
        df = spark.range(0, rows).selectExpr(
            "id AS k",
            f"CAST(CASE WHEN id % {step} = 0 THEN 'erase' ELSE 'keep' END "
            "AS STRING) AS tag",
            "id * 3 AS v",
            "repeat(uuid(), 4) AS payload",
        )
        walls = {}
        for mode in ("cow", "dv"):
            root = tempfile.mkdtemp(prefix=f"dvprobe_{mode}_{rows}_")
            snapshot_write(df.repartition(n_files, "k"), root, stats_cols=["k"])
            t0 = time.time()
            snapshot_delete(spark, root, [("tag", "=", "erase")], mode=mode)
            walls[f"{mode}_delete"] = time.time() - t0
            t0 = time.time()
            got = snapshot_read(spark, root)
            n = got.count()
            walls[f"{mode}_read"] = time.time() - t0
            assert n == rows - 1000, (mode, n)
            m = read_manifest(spark, root, 2)
            walls[f"{mode}_files_rewritten"] = (
                0 if mode == "dv" else len(m["files"])
            )
        # clean-split leg: a RANGE delete touches ~1 file; the split
        # scan anti-joins only that file and the bulk scans clean
        root = tempfile.mkdtemp(prefix=f"dvprobe_rng_{rows}_")
        snapshot_write(
            df.repartitionByRange(n_files, "k").sortWithinPartitions("k"),
            root,
            stats_cols=["k"],
        )
        snapshot_delete(spark, root, [("k", "<", 1000)], mode="dv")
        t0 = time.time()
        n = snapshot_read(spark, root).count()
        walls["dv_range_read"] = time.time() - t0
        assert n == rows - 1000
        print(
            f"rows={rows:>11,} files={n_files:>3} | cow delete "
            f"{walls['cow_delete']:6.2f}s (rewrote "
            f"{walls['cow_files_rewritten']} files) vs dv delete "
            f"{walls['dv_delete']:6.2f}s (rewrote 0) | read-after: cow "
            f"{walls['cow_read']:5.2f}s, dv-scattered "
            f"{walls['dv_read']:5.2f}s, dv-range (split scan) "
            f"{walls['dv_range_read']:5.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
