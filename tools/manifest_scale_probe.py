#!/usr/bin/env python
"""Manifest metadata cost vs table FILE COUNT — does the log-segment
(delta + checkpoint) manifest encoding actually bound per-commit
metadata at large file counts? (round-6; closes the module's long-noted
"manifest itself would shard" caveat with measurements.)

Fixture: a table whose CURRENT version references F synthetic files
(F = 1k/10k/100k — the manifest layer's cost model depends only on the
file LIST, so no data bytes are written; stats entries are included to
keep the JSON shape honest). Against it, commit a constant 8-file
append two ways:

* ``delta``  — ``_try_commit(..., prev=resolved)``: the on-disk form is
  adds/removes (+ batch-sized stats_adds). Expected: constant bytes and
  wall across decades.
* ``full``   — ``_try_commit(..., prev=None)``: the on-disk form is the
  complete file list. Expected: bytes and wall LINEAR in F — the cost
  every commit paid before this round.

Also measured: resolving the table head after 9 consecutive delta
commits (the worst case one checkpoint interval allows) vs reading one
full manifest — the read-side price of the write-side win.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_logs_parquet_converter_spark.plans.snapshots import (
    _try_commit,
    read_manifest,
)
from aws_logs_parquet_converter_spark.session import build_session

BATCH_FILES = 8
DECADES = [
    int(x)
    for x in os.environ.get("SCALE_FILE_DECADES", "1000,10000,100000").split(",")
]


def _files(prefix: str, n: int) -> list[str]:
    return [f"data/{prefix}/part-{i:06d}.parquet" for i in range(n)]


def _stats(files: list[str]) -> dict:
    # "#rows" = the per-file row count (ROWS_STAT_KEY) so the
    # metadata-count and history-totals legs stay pure metadata
    return {
        f: {"id": [i * 100, i * 100 + 99], "#rows": 100}
        for i, f in enumerate(files)
    }


def _manifest(version: int, files: list[str], action: str = "append") -> dict:
    return {
        "version": version,
        "action": action,
        "schema": '{"type":"struct","fields":[]}',
        "files": sorted(files),
        "stats_cols": ["id"],
        "stats": _stats(files),
        # per-file byte sizes are commit metadata since r8 (_resolve_sizes)
        # — synthetic entries keep the probe measuring the real on-disk
        # manifest shape without statting nonexistent files
        "sizes": {f: 64 * 1024 * 1024 for f in files},
    }


def main() -> None:
    spark = build_session(
        app_name="manifest_scale_probe",
        extra_conf={"spark.ui.enabled": "false"},
    )
    results = []
    for n_files in DECADES:
        root = tempfile.mkdtemp(prefix="manifest_probe_") + "/t"
        base_files = _files("c0", n_files)
        assert _try_commit(spark, root, _manifest(1, base_files))
        row: dict = {"table_files": n_files}
        sd = os.path.join(root, "_snapshots")
        row["full_manifest_bytes"] = os.path.getsize(
            os.path.join(sd, "v00000001.json")
        )

        # nine consecutive delta commits of a constant 8-file batch
        prev = read_manifest(spark, root, 1)
        delta_walls, delta_bytes = [], []
        files = list(base_files)
        for v in range(2, 11):
            files = files + _files(f"c{v}", BATCH_FILES)
            m = _manifest(v, files)
            t0 = time.perf_counter()
            assert _try_commit(spark, root, m, prev=prev)
            delta_walls.append(time.perf_counter() - t0)
            delta_bytes.append(
                os.path.getsize(os.path.join(sd, f"v{v:08d}.json"))
            )
            prev = m
        row["delta_commit_bytes"] = max(delta_bytes[:-1])  # v10 is a checkpoint
        row["ckpt_commit_bytes"] = delta_bytes[-1]
        row["delta_commit_wall_ms"] = round(min(delta_walls[:-1]) * 1000, 1)

        # the same append committed FULL (the pre-round-6 cost)
        t0 = time.perf_counter()
        assert _try_commit(
            spark, root, _manifest(11, files + _files("c11", BATCH_FILES))
        )
        row["full_commit_wall_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        row["full_commit_bytes"] = os.path.getsize(
            os.path.join(sd, "v00000011.json")
        )

        # read-side: resolve v9 (8 deltas back to the v1 full) vs read v1
        t0 = time.perf_counter()
        m9 = read_manifest(spark, root, 9)
        row["resolve_9deep_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        assert len(m9["files"]) == n_files + 8 * BATCH_FILES
        t0 = time.perf_counter()
        read_manifest(spark, root, 1)
        row["read_full_ms"] = round((time.perf_counter() - t0) * 1000, 1)

        # r11: DESCRIBE HISTORY + metadata COUNT over the 11-version
        # table — totals off the parquet form's columns (one pyarrow
        # sum + delta adjustments per version) vs the per-version
        # dict-materializing path
        from aws_logs_parquet_converter_spark.plans import (
            snapshots as _sn,
        )

        t0 = time.perf_counter()
        hist = _sn.snapshot_history(spark, root)
        row["history_wall_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        assert hist.count() == 11  # the 11-row job is untimed Spark noise
        t0 = time.perf_counter()
        assert _sn.snapshot_count(spark, root) > 0
        row["count_wall_ms"] = round((time.perf_counter() - t0) * 1000, 1)
        orig_ct = _sn._columnar_total
        _sn._columnar_total = lambda *a: (False, None)
        try:
            t0 = time.perf_counter()
            hist = _sn.snapshot_history(spark, root)
            row["history_dict_wall_ms"] = round(
                (time.perf_counter() - t0) * 1000, 1
            )
            assert hist.count() == 11
        finally:
            _sn._columnar_total = orig_ct

        results.append(row)
        print(json.dumps(row))
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)
    print(json.dumps({"probe": "manifest_scale", "results": results}))

    # --- tip-pointer leg (r9): TIP-RESOLUTION cost vs HISTORY LENGTH ---
    # Delta's _last_checkpoint design: with the advisory _latest pointer
    # the tip resolves in O(1) (read pointer + verify + one tip+1
    # probe) regardless of history length; the LIST fallback the old
    # code always paid is O(#versions). A stale pointer (lag L from a
    # crash window) adds exactly L existence probes.
    from aws_logs_parquet_converter_spark import storage as st

    ptr_results = []
    for n_versions in (
        int(x)
        for x in os.environ.get(
            "SCALE_VERSION_DECADES", "100,1000,10000"
        ).split(",")
    ):
        base = tempfile.mkdtemp(prefix="ptr_probe_")
        root = base + "/t"
        sd = os.path.join(root, "_snapshots")
        os.makedirs(sd)
        for v in range(1, n_versions + 1):
            with open(
                os.path.join(sd, f"v{v:08d}.json"), "w", encoding="utf-8"
            ) as fh:
                json.dump(
                    {
                        "version": v,
                        "files": [],
                        "schema": "{}",
                        "committed_at": 1000.0 + v,
                    },
                    fh,
                )
        impl = st.LocalSnapshotStorage()

        def _avg_us(fn, reps=50) -> float:
            t0 = time.perf_counter()
            for _ in range(reps):
                assert fn() == n_versions
            return round((time.perf_counter() - t0) / reps * 1e6, 1)

        impl.write_pointer(root, n_versions)
        row = {
            "versions": n_versions,
            "pointer_us": _avg_us(
                lambda: st.current_version_fast(impl, root)
            ),
        }
        impl.write_pointer(root, max(1, n_versions - 8))  # crash lag 8
        row["stale8_pointer_us"] = _avg_us(
            lambda: st.current_version_fast(impl, root)
        )
        os.remove(os.path.join(sd, st.POINTER_NAME))
        row["list_fallback_us"] = _avg_us(
            lambda: st.current_version_fast(impl, root)
        )
        ptr_results.append(row)
        print(json.dumps(row))
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps({"probe": "tip_pointer_scale", "results": ptr_results}))

    # --- compact-checkpoint leg (r10 VERDICT #2): the every-10th FULL
    # manifest was 13.1 MB of driver-decoded plain JSON at 100k live
    # files and ~10x at the 1M design point. encode_manifest_bytes'
    # columnar+gzip form must cut BOTH the stored/transferred bytes and
    # the single-threaded decode wall every checkpoint-crossing read
    # pays. Pure metadata — no Spark.
    comp_results = []
    for n_files in (
        int(x)
        for x in os.environ.get(
            "SCALE_CKPT_DECADES", "100000,1000000"
        ).split(",")
    ):
        files = _files("ck", n_files)
        raw = _manifest(50, files)
        t0 = time.perf_counter()
        plain = json.dumps(raw, sort_keys=True).encode("utf-8")
        enc_plain = time.perf_counter() - t0
        t0 = time.perf_counter()
        json.loads(plain)
        dec_plain = time.perf_counter() - t0
        old_min = st.MANIFEST_COMPACT_MIN_BYTES
        old_fmt0 = st.MANIFEST_BIG_FORMAT
        st.MANIFEST_COMPACT_MIN_BYTES = 1
        st.MANIFEST_BIG_FORMAT = "gzip"  # measure the r10 form explicitly
        try:
            t0 = time.perf_counter()
            blob = st.encode_manifest_bytes(raw)
            enc_c = time.perf_counter() - t0
            t0 = time.perf_counter()
            dec = st.decode_manifest_bytes(blob)
            dec_c = time.perf_counter() - t0
        finally:
            st.MANIFEST_COMPACT_MIN_BYTES = old_min
            st.MANIFEST_BIG_FORMAT = old_fmt0
        assert blob[:2] == b"\x1f\x8b" and len(dec["files"]) == n_files
        assert dec["stats"] == raw["stats"] and dec["sizes"] == raw["sizes"]
        row = {
            "files": n_files,
            "plain_bytes": len(plain),
            "compact_bytes": len(blob),
            "bytes_ratio": round(len(blob) / len(plain), 4),
            "plain_decode_ms": round(dec_plain * 1000, 1),
            "compact_decode_ms": round(dec_c * 1000, 1),
            "plain_encode_ms": round(enc_plain * 1000, 1),
            "compact_encode_ms": round(enc_c * 1000, 1),
        }
        # --- r11 PARQUET checkpoint leg (r10 VERDICT next-round #1): the
        # compact form fixed the BYTES but still charged every
        # checkpoint-crossing read a single-threaded gzip+JSON decode
        # (~3.2 s at 1M files). The parquet form is footer-lazy: a
        # scalar read (committed_at bisect) decodes the header only, a
        # scan materializes just the file list, and only a stats-walking
        # consumer pays the per-file dict floor.
        old_min = st.MANIFEST_COMPACT_MIN_BYTES
        old_fmt = st.MANIFEST_BIG_FORMAT
        st.MANIFEST_COMPACT_MIN_BYTES = 1
        st.MANIFEST_BIG_FORMAT = "parquet"
        try:
            t0 = time.perf_counter()
            pblob = st.encode_manifest_bytes(raw)
            enc_p = time.perf_counter() - t0
            t0 = time.perf_counter()
            pdec = st.decode_manifest_bytes(pblob)
            hdr_p = time.perf_counter() - t0  # header only: lazy decode
            assert pdec["version"] == 50  # scalar access stays header-cheap
            t0 = time.perf_counter()
            n_names = len(list(pdec["files"]))
            files_p = time.perf_counter() - t0
            t0 = time.perf_counter()
            full_stats = dict(pdec["stats"])
            full_sizes = dict(pdec["sizes"])
            full_p = files_p + hdr_p + (time.perf_counter() - t0)
        finally:
            st.MANIFEST_COMPACT_MIN_BYTES = old_min
            st.MANIFEST_BIG_FORMAT = old_fmt
        assert pblob[:4] == b"PAR1" and n_names == n_files
        assert full_stats == raw["stats"] and full_sizes == raw["sizes"]
        row.update(
            {
                "parquet_bytes": len(pblob),
                "parquet_encode_ms": round(enc_p * 1000, 1),
                "parquet_header_ms": round(hdr_p * 1000, 2),
                "parquet_files_ms": round(files_p * 1000, 1),
                "parquet_full_ms": round(full_p * 1000, 1),
            }
        )
        # --- r11 vectorized-prune leg: a FILTERED READ's file pruning
        # over the parquet form. The arrow path evaluates the min/max
        # range tests with pyarrow.compute over the encoded stats
        # columns (never building the per-file dicts); the scalar loop
        # — forced by stripping the handle — pays the full lazy-decode
        # materialization plus the per-file pass, the pre-r11 cost of
        # every filtered checkpoint-crossing read.
        from aws_logs_parquet_converter_spark.plans import snapshots as sn

        types = {"id": "long"}
        filters = [("id", ">=", n_files * 50), ("id", "<", n_files * 60)]
        pdec2 = st.decode_manifest_bytes(pblob)
        t0 = time.perf_counter()
        got_vec = sn._prune_survivors(pdec2, pdec2["files"], types, filters)
        vec_ms = time.perf_counter() - t0
        pdec3 = st.decode_manifest_bytes(pblob)
        pdec3["stats"].arrow = None  # force the scalar loop
        t0 = time.perf_counter()
        got_sca = sn._prune_survivors(pdec3, pdec3["files"], types, filters)
        sca_ms = time.perf_counter() - t0
        assert got_vec == got_sca and 0 < len(got_vec) < n_files
        row.update(
            {
                "prune_survivors": len(got_vec),
                "prune_vec_ms": round(vec_ms * 1000, 1),
                "prune_scalar_ms": round(sca_ms * 1000, 1),
            }
        )
        # partitioned variant: a partition predicate + a stats range —
        # the r11 partition-override vectorization means neither the
        # stats NOR the partitions dict is built
        praw = dict(raw)
        praw["partition_by"] = ["day"]
        praw["partitions"] = {
            f: [f"2024-01-{(i % 30) + 1:02d}"] for i, f in enumerate(files)
        }
        st.MANIFEST_COMPACT_MIN_BYTES = 1
        st.MANIFEST_BIG_FORMAT = "parquet"
        try:
            ppblob = st.encode_manifest_bytes(praw)
        finally:
            st.MANIFEST_COMPACT_MIN_BYTES = old_min
            st.MANIFEST_BIG_FORMAT = old_fmt
        ptypes = {"id": "long", "day": "string"}
        pfilters = [("day", "=", "2024-01-05"), ("id", ">=", n_files * 50)]
        ppdec = st.decode_manifest_bytes(ppblob)
        t0 = time.perf_counter()
        got_pvec = sn._prune_survivors(ppdec, ppdec["files"], ptypes, pfilters)
        pvec_ms = time.perf_counter() - t0
        assert ppdec["partitions"]._d is None and ppdec["stats"]._d is None
        ppdec2 = st.decode_manifest_bytes(ppblob)
        ppdec2["stats"].arrow = None
        ppdec2["partitions"].arrow = None
        t0 = time.perf_counter()
        got_psca = sn._prune_survivors(ppdec2, ppdec2["files"], ptypes, pfilters)
        psca_ms = time.perf_counter() - t0
        assert got_pvec == got_psca and 0 < len(got_pvec) < n_files
        row.update(
            {
                "prune_part_survivors": len(got_pvec),
                "prune_part_vec_ms": round(pvec_ms * 1000, 1),
                "prune_part_scalar_ms": round(psca_ms * 1000, 1),
            }
        )
        comp_results.append(row)
        print(json.dumps(row))
    print(json.dumps({"probe": "compact_checkpoint", "results": comp_results}))

    # --- COLUMNAR COMMIT leg (r12 VERDICT #1): the write side. r11 left
    # one honest residual — every CHECKPOINT commit rebuilt the full
    # per-file dicts to encode (4.4 s at 1M files). The rebased commit
    # path (RebasedFiles/RebasedSection + _to_parquet_rebase) must make
    # (a) delta commits O(batch) wall with NO base materialization and
    # (b) checkpoint commits bounded by the C-side arrow copy, not the
    # Python dict floor — measured against the scalar encoder on the
    # same logical manifest, one more decade out (10M).
    reb_results = []
    for n_files in (
        int(x)
        for x in os.environ.get(
            "SCALE_REBASE_DECADES", "1000000,10000000"
        ).split(",")
    ):
        base_dir = tempfile.mkdtemp(prefix="rebase_probe_")
        root = base_dir + "/t"
        files = _files("c0", n_files)
        t0 = time.perf_counter()
        assert _try_commit(spark, root, _manifest(1, files))
        fixture_s = time.perf_counter() - t0
        row = {
            "table_files": n_files,
            "fixture_full_commit_s": round(fixture_s, 2),
        }
        del files
        engaged = {"n": 0}
        orig_reb = st._to_parquet_rebase

        def _spy(raw):
            blob = orig_reb(raw)
            if blob is not None:
                engaged["n"] += 1
            return blob

        st._to_parquet_rebase = _spy
        try:
            # v2..v9: rebased delta commits of a constant 8-file batch
            delta_walls = []
            for v in range(2, 10):
                t0 = time.perf_counter()
                prev = read_manifest(spark, root, v - 1)
                adds = _files(f"r{v}", BATCH_FILES)
                files_obj = st.rebase_files(prev["files"], adds)
                m = {
                    "version": v,
                    "action": "append",
                    "schema": '{"type":"struct","fields":[]}',
                    "files": files_obj,
                    "stats_cols": ["id"],
                    "stats": st.rebase_section(
                        prev["stats"], _stats(adds), frozenset(), files_obj
                    ),
                }
                assert _try_commit(
                    spark, root, m, prev=prev,
                    new_sizes={f: 1024 for f in adds},
                )
                delta_walls.append(time.perf_counter() - t0)
            row["rebased_delta_commit_ms"] = round(min(delta_walls) * 1000, 1)
            # v10: the CHECKPOINT commit — arrow-to-arrow
            t0 = time.perf_counter()
            prev = read_manifest(spark, root, 9)
            adds = _files("r10", BATCH_FILES)
            files_obj = st.rebase_files(prev["files"], adds)
            m = {
                "version": 10,
                "action": "append",
                "schema": '{"type":"struct","fields":[]}',
                "files": files_obj,
                "stats_cols": ["id"],
                "stats": st.rebase_section(
                    prev["stats"], _stats(adds), frozenset(), files_obj
                ),
            }
            assert _try_commit(
                spark, root, m, prev=prev, new_sizes={f: 1024 for f in adds}
            )
            row["rebased_ckpt_commit_s"] = round(time.perf_counter() - t0, 2)
            assert engaged["n"] == 1, engaged  # exactly the checkpoint
        finally:
            st._to_parquet_rebase = orig_reb
        # the SCALAR encode of the same checkpoint (the r11 cost):
        # materialized dicts -> _to_parquet
        m10 = read_manifest(spark, root, 10)
        t0 = time.perf_counter()
        st._to_parquet(st.materialize_manifest(m10))
        row["scalar_ckpt_encode_s"] = round(time.perf_counter() - t0, 2)
        # read-back sanity: the rebased checkpoint resolves correctly
        assert len(m10["files"]) == n_files + 9 * BATCH_FILES
        reb_results.append(row)
        print(json.dumps(row))
        shutil.rmtree(base_dir, ignore_errors=True)
    print(json.dumps({"probe": "columnar_commit", "results": reb_results}))
    spark.stop()


if __name__ == "__main__":
    main()
