"""Decade probe for bloom-sidecar point-lookup skipping (plans/snapshots).

Measures, at 1x/10x/100x corpus size with file count growing alongside
(the ingest shape: more data -> more files, file size roughly constant):

* sidecar build wall (the one extra commit-time pass),
* sidecar size on disk vs data size,
* files read for present-key lookups (want ~1 + FPR * (n_files - 1)),
* measured false-positive rate over absent-key probes (files read that
  hold no match), against the analytic load-factor prediction.

Run: python tools/bloom_scale_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.plans.snapshots import (
    BLOOM_BITS,
    BLOOM_HASHES,
    read_manifest,
    snapshot_read,
    snapshot_write,
)
from aws_logs_parquet_converter_spark.session import build_session


def _dir_bytes(d: str) -> int:
    total = 0
    for base, _, names in os.walk(d):
        for n in names:
            total += os.path.getsize(os.path.join(base, n))
    return total


def main() -> None:
    spark = build_session(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    print(
        f"geometry: m={BLOOM_BITS} bits fixed space (sparse sidecar), "
        f"k={BLOOM_HASHES}"
    )
    for rows, n_files in ((20_000, 4), (200_000, 8), (2_000_000, 16)):
        root = tempfile.mkdtemp(prefix=f"bloom_probe_{rows}_")
        df = spark.range(0, rows).selectExpr(
            "id AS k", "CAST(id % 97 AS STRING) AS tag", "id * 3 AS v"
        )
        t0 = time.time()
        snapshot_write(df.repartition(n_files, "k"), root)
        plain_wall = time.time() - t0
        root2 = tempfile.mkdtemp(prefix=f"bloom_probe_b_{rows}_")
        t0 = time.time()
        snapshot_write(df.repartition(n_files, "k"), root2, bloom_cols=["k"])
        bloom_wall = time.time() - t0
        m = read_manifest(spark, root2, 1)
        side_bytes = sum(
            os.path.getsize(os.path.join(root2, p)) for p in m["bloom"]["files"]
        )
        data_bytes = _dir_bytes(os.path.join(root2, "data")) - side_bytes
        # present keys: deterministic spread
        present_reads = []
        t0 = time.time()
        for key in range(0, rows, max(1, rows // 8))[:8]:
            r = snapshot_read(spark, root2, filters=[("k", "=", key)])
            assert r.count() == 1
            present_reads.append(len(r.inputFiles()))
        lookup_wall = (time.time() - t0) / len(present_reads)
        # absent keys: measured FPR = extra files read / possible
        fp, probes = 0, 16
        for i in range(probes):
            r = snapshot_read(
                spark, root2, filters=[("k", "=", rows * 10 + i * 7919)]
            )
            fp += len(r.inputFiles())
        per_file = rows // n_files
        load = 1 - (1 - 1 / BLOOM_BITS) ** (per_file * BLOOM_HASHES)
        pred_fpr = load**BLOOM_HASHES
        print(
            f"rows={rows:>9,} files={n_files:>3} | commit wall "
            f"{plain_wall:5.2f}s plain vs {bloom_wall:5.2f}s +bloom | "
            f"sidecar {side_bytes/1024:7.1f} KiB "
            f"({side_bytes/max(data_bytes,1)*100:4.1f}% of data) | "
            f"present-key files read avg "
            f"{sum(present_reads)/len(present_reads):4.2f} of {n_files} "
            f"({lookup_wall:4.2f}s/lookup) | absent-key FP files "
            f"{fp}/{probes*n_files} = {fp/(probes*n_files)*100:5.2f}% "
            f"(analytic {pred_fpr*100:5.2f}%)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
