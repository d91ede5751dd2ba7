#!/usr/bin/env python
"""Vacuum + OPTIMIZE metadata walls at the 1M and 10M-file decades
(r12 verdict #6), pure metadata — synthetic parquet-form manifests on
local disk, no Spark session.

* ``vacuum_referenced_s`` — `_vacuum_referenced` over an 11-version
  history with keep_last=7: ONE incremental walk (r11). Inherently
  O(F) — the result is the referenced-key set every candidate object is
  checked against — so the number to watch is the CONSTANT per decade,
  not flatness.
* ``optimize_select_columnar_s`` vs ``optimize_select_scalar_s`` — the
  incremental OPTIMIZE candidate pass: pyarrow mask over the sizes
  column + O(fresh) overlays (r12 `_small_file_candidates`) vs the
  `_live_sizes` dict build + per-file loop. The columnar wall tracks
  the small-file TAIL (~1% here), the scalar one the table.

Fixture: v1 full manifest of F files (sizes: 99% at 64 MB, 1% small),
v2..v11 deltas adding 8 small files and removing 3 each.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark import storage as st
from aws_logs_parquet_converter_spark.plans import snapshots as sn

DECADES = [
    int(x)
    for x in os.environ.get(
        "VAC_OPT_DECADES", "1000000,10000000"
    ).split(",")
]
SMALL = 4 * 1024 * 1024
BIG = 64 * 1024 * 1024


def main() -> None:
    results = []
    old_min, old_fmt = st.MANIFEST_COMPACT_MIN_BYTES, st.MANIFEST_BIG_FORMAT
    st.MANIFEST_COMPACT_MIN_BYTES = 1
    st.MANIFEST_BIG_FORMAT = "parquet"
    try:
        for n in DECADES:
            base_dir = tempfile.mkdtemp(prefix="vacopt_probe_")
            root = base_dir + "/t"
            sd = os.path.join(root, "_snapshots")
            os.makedirs(sd)
            store = st.LocalSnapshotStorage()
            files = [f"data/c0/part-{i:08d}.parquet" for i in range(n)]
            row: dict = {"table_files": n}
            t0 = time.perf_counter()
            full = {
                "version": 1,
                "schema": "{}",
                "committed_at": 1.0,
                "action": "append",
                "files": files,
                "sizes": {
                    f: (SMALL if i % 100 == 0 else BIG)
                    for i, f in enumerate(files)
                },
                "stats_cols": ["id"],
                "stats": {
                    f: {"id": [i, i + 9], "#rows": 10}
                    for i, f in enumerate(files)
                },
            }
            with open(os.path.join(sd, "v00000001.json"), "wb") as fh:
                fh.write(st.encode_manifest_bytes(full))
            del full
            row["fixture_encode_s"] = round(time.perf_counter() - t0, 2)
            live = list(files)
            del files
            for v in range(2, 12):
                adds = [f"data/c{v}/part-{i:02d}.parquet" for i in range(8)]
                removes = live[:3]
                live = live[3:] + adds
                d = {
                    "version": v,
                    "base": v - 1,
                    "schema": "{}",
                    "committed_at": float(v),
                    "action": "append",
                    "adds": adds,
                    "removes": removes,
                    "sizes_adds": {f: SMALL for f in adds},
                    "stats_cols": ["id"],
                    "stats_adds": {f: {"id": [0, 9], "#rows": 10} for f in adds},
                }
                with open(os.path.join(sd, f"v{v:08d}.json"), "wb") as fh:
                    fh.write(st.encode_manifest_bytes(d))

            # each measurement runs in a FRESH subprocess: the fixture
            # build above churns ~20 GB of transient dicts, and measuring
            # in the same process overstates the walls ~3x from allocator
            # pressure alone (measured: 70.8 s vs 24.6 s at 10M)
            import subprocess

            code = f"""
import json, sys, time
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from aws_logs_parquet_converter_spark import storage as st
from aws_logs_parquet_converter_spark.plans import snapshots as sn
store = st.LocalSnapshotStorage()
root = {root!r}
t0 = time.perf_counter()
ref, ch = sn._vacuum_referenced(store, root, list(range(5, 12)), list(range(1, 12)))
out = {{"vacuum_referenced_s": round(time.perf_counter() - t0, 2),
       "vacuum_referenced_keys": len(ref)}}
m = st.read_manifest(store, root, 11)
t0 = time.perf_counter()
cand = sn._small_file_candidates(m, {BIG / 2})
out["optimize_select_columnar_s"] = round(time.perf_counter() - t0, 2)
assert cand is not None, "columnar selection fell back"
out["optimize_candidates"] = len(cand[0])
m2 = st.read_manifest(store, root, 11)
t0 = time.perf_counter()
sizes = sn._live_sizes(None, root, m2)
rewrite = [f for f in m2["files"] if sizes[f] < {BIG / 2}]
out["optimize_select_scalar_s"] = round(time.perf_counter() - t0, 2)
assert sorted(rewrite) == cand[0], "selection A/B diverged"
print(json.dumps(out))
"""
            got = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, check=True,
            )
            row.update(json.loads(got.stdout.strip().splitlines()[-1]))
            results.append(row)
            print(json.dumps(row), flush=True)
            shutil.rmtree(base_dir, ignore_errors=True)
    finally:
        st.MANIFEST_COMPACT_MIN_BYTES = old_min
        st.MANIFEST_BIG_FORMAT = old_fmt
    print(json.dumps({"probe": "vacuum_optimize_scale", "results": results}))


if __name__ == "__main__":
    main()
