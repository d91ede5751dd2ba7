#!/usr/bin/env python
"""Rate-limited stream admission cost vs BACKLOG LENGTH — is
``maxFilesPerTrigger`` really a bounded-batch, bounded-poll mechanism on
a deep backlog, or does catching up degrade with history? (round-9;
validates the claim the option exists to make: a stream pointed at a
100 TB table with a 10k-commit backlog must take it in governed slices
whose PLANNING cost does not grow with what is already consumed.)

Fixture: synthetic manifests only (the admission walk and partition
planning read pure metadata — per-file ``sizes`` ride the manifests, so
no data bytes are needed), C commits x 4 files each, committed through
the real ``_try_commit`` (delta + checkpoint encoding, in-commit
stamps). Against each backlog decade, drive the real
``_SnapshotStreamReader`` exactly the way MicroBatchExecution does
(initialOffset / latestOffset / partitions) at ``maxFilesPerTrigger=8``
and measure:

* ``batch_max_files`` — the invariant: no batch ever exceeds the limit.
* ``poll_ms_p50`` / ``poll_ms_max`` — per-poll wall (latestOffset +
  partitions). Expected: governed by the admitted batch plus at most
  one checkpoint-window manifest resolution — FLAT across decades,
  including late polls whose consumed prefix is long.
* ``idle_poll_ms`` — a caught-up poll. Expected: O(1) tip-pointer read.
* ``restart_poll_ms`` — a FRESH reader resuming mid-backlog (the
  engine's replay-then-poll restart contract): its first admission must
  cost the same as any steady-state poll, not O(consumed prefix).

Run: python tools/rate_limit_probe.py   (env RATE_COMMITS=25,100,400)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.plans.snapshots import _try_commit
from aws_logs_parquet_converter_spark.session import build_session

FILES_PER_COMMIT = 4
MAX_FILES = 8
DECADES = [
    int(x) for x in os.environ.get("RATE_COMMITS", "25,100,400").split(",")
]


def _manifest(version: int, files: list[str]) -> dict:
    return {
        "version": version,
        "action": "append",
        "schema": json.dumps(
            {
                "type": "struct",
                "fields": [
                    {
                        "name": "id",
                        "type": "long",
                        "nullable": True,
                        "metadata": {},
                    }
                ],
            }
        ),
        "files": sorted(files),
        "sizes": {f: 64 * 1024 * 1024 for f in files},
    }


def _reader(root: str, cdf: bool = False):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from aws_logs_parquet_converter_spark.sources.snapshot_stream import (
        _SnapshotStreamReader,
    )

    schema = StructType([StructField("id", LongType())])
    opts = {"root": root, "maxfilespertrigger": str(MAX_FILES)}
    if cdf:
        schema = schema.add("_change_type", StringType()).add(
            "_commit_version", LongType()
        )
        opts["changefeed"] = "true"
    return _SnapshotStreamReader(schema, opts)


def main() -> None:
    spark = build_session(
        app_name="rate_limit_probe", extra_conf={"spark.ui.enabled": "false"}
    )
    results = []
    for commits in DECADES:
        root = tempfile.mkdtemp(prefix="rate_probe_") + "/t"
        files: list[str] = []
        prev = None
        for v in range(1, commits + 1):
            files = files + [
                f"data/{v:08d}/part-{i}.parquet"
                for i in range(FILES_PER_COMMIT)
            ]
            m = _manifest(v, files)
            assert _try_commit(spark, root, m, prev=prev)
            prev = m
        total_files = commits * FILES_PER_COMMIT

        r = _reader(root)
        cur = r.initialOffset()
        polls: list[float] = []
        sizes: list[int] = []
        seen: list[str] = []
        restart_ms = None
        while True:
            t0 = time.perf_counter()
            nxt = r.latestOffset()
            if json.dumps(nxt, sort_keys=True) == json.dumps(
                cur, sort_keys=True
            ):
                idle_ms = (time.perf_counter() - t0) * 1000
                break
            parts = r.partitions(cur, nxt)
            polls.append((time.perf_counter() - t0) * 1000)
            sizes.append(len(parts))
            seen.extend(p.entry for p in parts)
            r.commit(nxt)
            if restart_ms is None and len(seen) >= total_files // 2:
                # mid-backlog RESTART: fresh reader, engine replays the
                # last logged batch (partitions) before its first poll
                r2 = _reader(root)
                r2.partitions(cur, nxt)
                t1 = time.perf_counter()
                n2 = r2.latestOffset()
                r2.partitions(nxt, n2)
                restart_ms = (time.perf_counter() - t1) * 1000
            cur = nxt
        assert sorted(seen) == sorted(
            set(seen)
        ), "a file was planned twice during the drain"
        assert len(seen) == total_files, (len(seen), total_files)
        assert max(sizes) <= MAX_FILES, sizes

        # the CHANGE-FEED twin over the same backlog: raw-walk polls
        # must stay O(admitted) too (the insert specs come straight
        # from the delta manifests' adds)
        rc = _reader(root, cdf=True)
        cur = rc.initialOffset()
        cdf_polls: list[float] = []
        cdf_specs = 0
        while True:
            t0 = time.perf_counter()
            nxt = rc.latestOffset()
            if json.dumps(nxt, sort_keys=True) == json.dumps(
                cur, sort_keys=True
            ):
                break
            parts = rc.partitions(cur, nxt)
            cdf_polls.append((time.perf_counter() - t0) * 1000)
            cdf_specs += len(parts)
            assert len(parts) <= MAX_FILES
            rc.commit(nxt)
            cur = nxt
        assert cdf_specs == total_files, (cdf_specs, total_files)

        results.append(
            {
                "backlog_commits": commits,
                "backlog_files": total_files,
                "n_batches": len(polls),
                "batch_max_files": max(sizes),
                "poll_ms_p50": round(statistics.median(polls), 2),
                "poll_ms_max": round(max(polls), 2),
                "cdf_poll_ms_p50": round(statistics.median(cdf_polls), 2),
                "idle_poll_ms": round(idle_ms, 2),
                "restart_poll_ms": round(restart_ms, 2),
            }
        )
        print(json.dumps(results[-1]))
    spark.stop()

    # flatness check across decades: p50 poll cost must not scale with
    # the backlog (16x commits => well under 4x poll time)
    lo, hi = results[0], results[-1]
    ratio = hi["poll_ms_p50"] / max(lo["poll_ms_p50"], 0.01)
    growth = hi["backlog_commits"] / lo["backlog_commits"]
    print(
        json.dumps(
            {
                "poll_p50_ratio": round(ratio, 2),
                "backlog_growth": growth,
                "verdict": "FLAT" if ratio < growth / 4 else "GROWING",
            }
        )
    )


if __name__ == "__main__":
    main()
