#!/usr/bin/env python
"""Manifest-commit throughput under writer contention (round-6).

The optimistic CAS protocol admits exactly one winner per round; W
uncoordinated writers therefore pay retries that grow with W. The
thread-race stress test (tests/test_snapshots.py) pins CORRECTNESS —
every commit lands exactly once; this probe MEASURES the cost: total
wall and CAS attempts for a fixed 24-append workload split across
1 / 4 / 8 writer threads on one table (local[32], one Spark session,
tiny 100-row appends so the data write is negligible and the manifest
protocol dominates).

Expected shape: attempts/commit grows roughly linearly with W (each
lost round is one extra manifest list+read, throttled by
_commit_backoff), while total wall stays bounded — contention costs
retries, not serialization collapse. Results in SCALE.md "Commit
contention".
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.session import build_session

TOTAL_COMMITS = 24
WRITERS = [1, 4, 8]


class _CountingStore:
    """LogStore decorator counting put-if-absent attempts (wins+losses)."""

    def __init__(self, inner):
        self.inner = inner
        self.attempts = 0

    def put_if_absent(self, fs, tmp, final) -> bool:
        self.attempts += 1
        return self.inner.put_if_absent(fs, tmp, final)


def main() -> None:
    spark = build_session(
        app_name="commit_contention_probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    from aws_logs_parquet_converter_spark.plans import snapshots as S

    out = []
    for w in WRITERS:
        root = tempfile.mkdtemp(prefix=f"contention_{w}w_")
        counter = _CountingStore(S.AtomicRenameLogStore())
        prev = S.set_log_store(counter)
        try:
            per_writer = TOTAL_COMMITS // w

            def writer(i: int) -> None:
                for j in range(per_writer):
                    lo = (i * per_writer + j) * 100
                    S.snapshot_write(
                        spark.range(lo, lo + 100).selectExpr("id", "id*2 AS v"),
                        root,
                    )

            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=w) as ex:
                list(ex.map(writer, range(w)))
            wall = round(time.perf_counter() - t0, 3)
        finally:
            S.set_log_store(prev)
        n_committed = S.current_version(spark, root)
        rows = S.snapshot_read(spark, root).count()
        assert n_committed == TOTAL_COMMITS and rows == TOTAL_COMMITS * 100
        row = {
            "writers": w,
            "commits": TOTAL_COMMITS,
            "wall_s": wall,
            "cas_attempts": counter.attempts,
            "attempts_per_commit": round(counter.attempts / TOTAL_COMMITS, 2),
            "commits_per_s": round(TOTAL_COMMITS / wall, 2),
        }
        out.append(row)
        print(json.dumps(row))
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"probe": "commit_contention", "rows": out}))
    spark.stop()


if __name__ == "__main__":
    main()
