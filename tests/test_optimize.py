"""plans/optimize.py — small-file bin-pack maintenance op.

Pins the properties the docstring claims: metadata-only selection, file
counts reduced to the size-appropriate number, content preserved exactly,
idempotence (second run is a no-op), and well-packed partitions untouched.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.catalog import load_table
from aws_logs_parquet_converter_spark.plans.optimize import (
    optimize_partitions,
    partition_file_stats,
    select_partitions_to_optimize,
)

SF = "/root/testdata/sf0.001"


def _files(dest: str, part: str) -> list[str]:
    return sorted(glob.glob(os.path.join(dest, part, "*.parquet")))


def _seed(spark, dest: str, n_files: int = 6) -> None:
    o = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("year"),
    )
    o.repartition(n_files).write.mode("overwrite").partitionBy("year").parquet(dest)


def test_optimize_packs_reduces_files_and_preserves_content(spark, tmp_path):
    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    before = spark.read.parquet(dest)
    rows_before = sorted(
        (r.o_orderkey, r.o_totalprice, r.year) for r in before.collect()
    )
    stats = partition_file_stats(spark, dest, "year")
    assert stats and all(p.n_files >= 2 for p in stats)

    rewritten = optimize_partitions(spark, dest, "year", target_file_mb=128)
    assert sorted(rewritten) == [p.value for p in stats]  # all were fragmented
    for p in partition_file_stats(spark, dest, "year"):
        assert p.n_files == 1  # tiny partitions pack to one file at 128 MB
    rows_after = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).collect()
    )
    assert rows_after == rows_before


def test_optimize_is_idempotent_and_skips_packed_partitions(spark, tmp_path):
    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    assert optimize_partitions(spark, dest, "year", target_file_mb=128)
    # second run: every partition already at target -> metadata-only no-op
    stats = partition_file_stats(spark, dest, "year")
    assert select_partitions_to_optimize(stats, target_file_mb=128) == []
    mtimes = {f: os.path.getmtime(f) for p in stats for f in _files(dest, f"year={p.value}")}
    assert optimize_partitions(spark, dest, "year", target_file_mb=128) == []
    for f, t in mtimes.items():
        assert os.path.getmtime(f) == t  # packed files untouched


def test_optimize_respects_target_file_size(spark, tmp_path):
    dest = str(tmp_path / "tbl")
    _seed(spark, dest, n_files=6)
    stats = {p.value: p for p in partition_file_stats(spark, dest, "year")}
    # pick a target below each partition's bytes so packing needs >1 file
    some = next(iter(stats.values()))
    tiny_mb = max(1, int(some.total_bytes / (1024 * 1024) / 2)) or 1
    optimize_partitions(spark, dest, "year", target_file_mb=tiny_mb)
    import math

    for p in partition_file_stats(spark, dest, "year"):
        want = max(1, math.ceil(stats[p.value].total_bytes / (tiny_mb * 1024 * 1024)))
        # coalesce packs to AT MOST `want` (rewritten bytes can shrink)
        assert p.n_files <= want
        assert p.n_files < stats[p.value].n_files


def test_optimize_recovers_crash_residue_not_deletes(spark, tmp_path):
    """Crash-residue policy: a half-written rewrite (.X__optimize_tmp) is
    disposable and deleted; a moved-aside partition whose swap never
    completed (.X__optimize_old, live dir MISSING) is the only copy and is
    restored verbatim; the ambiguous state (both live and a non-empty
    old exist) raises instead of guessing — nothing is deleted."""
    import shutil

    import pytest

    from aws_logs_parquet_converter_spark.plans.optimize import (
        recover_optimize_residue,
    )

    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    rows_before = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).collect()
    )
    parts = sorted(
        p for p in os.listdir(dest) if p.startswith("year=")
    )
    victim = os.path.join(dest, parts[0])

    # disposable half-written rewrite residue
    tmp_res = os.path.join(dest, f".{parts[1]}__optimize_tmp")
    os.makedirs(tmp_res)
    with open(os.path.join(tmp_res, "part-junk.parquet"), "w") as f:
        f.write("halfwritten")

    # mid-swap crash: live dir was renamed aside, swap-in never happened
    old_res = os.path.join(dest, f".{parts[0]}__optimize_old")
    shutil.move(victim, old_res)
    assert not os.path.exists(victim)

    actions = recover_optimize_residue(spark, dest)
    assert len(actions) == 2
    assert os.path.exists(victim)  # restored, not deleted
    assert not os.path.exists(old_res)
    assert not os.path.exists(tmp_res)
    rows_after = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).collect()
    )
    assert rows_after == rows_before

    # ambiguous state: BOTH live and non-empty old exist -> raise, keep both
    os.makedirs(old_res)
    src_file = os.path.join(victim, sorted(os.listdir(victim))[0])
    shutil.copy(src_file, os.path.join(old_res, "orphan.parquet"))
    with pytest.raises(IOError, match="ambiguous"):
        optimize_partitions(spark, dest, "year", target_file_mb=128)
    assert os.path.exists(old_res) and os.path.exists(victim)  # untouched


def test_optimize_residue_invisible_to_table_reads(spark, tmp_path):
    """In-flight/crashed rewrite dirs are dot-prefixed, so Spark partition
    discovery skips them: a concurrent table-root read during (or after a
    crash of) an OPTIMIZE never sees duplicate rows or bogus partitions."""
    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    n = spark.read.parquet(dest).count()
    parts = sorted(p for p in os.listdir(dest) if p.startswith("year="))
    # simulate a full stale copy parked in both residue roles
    import shutil

    shutil.copytree(
        os.path.join(dest, parts[0]),
        os.path.join(dest, f".{parts[0]}__optimize_tmp"),
    )
    shutil.copytree(
        os.path.join(dest, parts[1]),
        os.path.join(dest, f".{parts[1]}__optimize_old"),
    )
    assert spark.read.parquet(dest).count() == n  # no double-count
    stats = partition_file_stats(spark, dest, "year")
    assert [p.value for p in stats] == [p.split("=")[1] for p in parts]


def test_optimize_collapses_nested_batch_partitions(spark, tmp_path):
    """Stream-ingested day=X/batch=N layouts pack into a single batch=-1
    leaf per day — same directory depth (table stays readable), fewer
    files, content preserved minus the bookkeeping column."""
    dest = str(tmp_path / "tbl")
    o = load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.date_format("o_orderdate", "yyyy").alias("year"),
    )
    for b in range(4):  # four "micro-batch" commits per year partition
        (
            o.where(F.col("o_orderkey") % 4 == b)
            .withColumn("batch", F.lit(b))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("year", "batch")
            .parquet(dest)
        )
    rows_before = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).drop("batch").collect()
    )
    stats = partition_file_stats(spark, dest, "year")
    assert all(p.nested for p in stats)
    assert all(p.n_files >= 4 for p in stats)

    rewritten = optimize_partitions(
        spark, dest, "year", target_file_mb=128, collapse=("batch", "-1")
    )
    assert rewritten == [p.value for p in stats]
    after = partition_file_stats(spark, dest, "year")
    assert all(p.n_files == 1 for p in after)
    out = spark.read.parquet(dest)
    assert sorted(
        (r.o_orderkey, r.o_totalprice, r.year) for r in out.drop("batch").collect()
    ) == rows_before
    assert out.select("batch").distinct().collect()[0].batch == -1


def test_optimize_plain_date_layout(spark, tmp_path):
    """partition_col=None treats every visible child dir as a partition —
    the reference's plain date layout (no col= prefix), which is what the
    CLI's --optimize-after sweeps."""
    dest = str(tmp_path / "tbl")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    for day in ("2024-01-01", "2024-01-02"):
        o.repartition(5).write.mode("overwrite").parquet(f"{dest}/{day}")
    os.makedirs(f"{dest}/_staging")  # must be ignored
    stats = partition_file_stats(spark, dest, None)
    assert [p.value for p in stats] == ["2024-01-01", "2024-01-02"]
    assert all(p.n_files == 5 for p in stats)

    done = optimize_partitions(spark, dest, None, target_file_mb=128)
    assert done == ["2024-01-01", "2024-01-02"]
    after = {p.value: p.n_files for p in partition_file_stats(spark, dest, None)}
    assert after == {"2024-01-01": 1, "2024-01-02": 1}
    assert spark.read.parquet(f"{dest}/2024-01-01").count() == o.count()


def test_cli_optimize_after_flag():
    from aws_logs_parquet_converter_spark.cli import parse_arguments

    a = parse_arguments(["--source-root", "/x", "--optimize-after"])
    assert a.optimize_after
    assert not parse_arguments(["--source-root", "/x"]).optimize_after


def test_optimize_after_month_walk_preserves_date_tree(spark, tmp_path):
    """The CLI's --optimize-after sweep: walk the compacted date tree to
    MONTH level, pack each month's fragmented day dirs — both plain
    YYYY/MM/DD and hive year=/month=/day= layouts — without disturbing
    the tree nesting the readers and the retention sweep rely on."""
    from aws_logs_parquet_converter_spark.plans.retention import (
        list_month_dirs,
    )

    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    n_rows = o.count()

    for hive, days in (
        (False, ["2024/07/01", "2024/07/02", "2024/08/01"]),
        (True, ["year=2024/month=07/day=01", "year=2024/month=08/day=02"]),
    ):
        root = str(tmp_path / ("hive" if hive else "plain"))
        for d in days:
            o.repartition(4).write.mode("overwrite").parquet(f"{root}/{d}")
        months = list_month_dirs(spark, root, hive=hive)
        assert len(months) == 2, months

        packed = [
            v
            for m in months
            for v in optimize_partitions(
                spark, m, "day" if hive else None, target_file_mb=128
            )
        ]
        assert len(packed) == len(days)
        for d in days:
            files = glob.glob(f"{root}/{d}/*.parquet")
            assert len(files) == 1, (d, files)  # packed in place
            assert spark.read.parquet(f"{root}/{d}").count() == n_rows


def test_optimize_recovers_legacy_nondot_residue(spark, tmp_path):
    """Residue from the pre-dot-prefix version of this op (bare
    year=X__optimize_old / __optimize_tmp names) is visible to Spark
    partition discovery as a bogus partition value, so recovery must
    sweep it with the same restore-or-raise policy."""
    import shutil

    from aws_logs_parquet_converter_spark.plans.optimize import (
        recover_optimize_residue,
    )

    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    rows_before = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).collect()
    )
    parts = sorted(p for p in os.listdir(dest) if p.startswith("year="))
    victim = os.path.join(dest, parts[0])

    # legacy mid-swap crash: live moved aside under the OLD (non-dot) name
    legacy_old = os.path.join(dest, f"{parts[0]}__optimize_old")
    shutil.move(victim, legacy_old)
    # legacy half-written rewrite
    legacy_tmp = os.path.join(dest, f"{parts[1]}__optimize_tmp")
    os.makedirs(legacy_tmp)
    with open(os.path.join(legacy_tmp, "part-junk.parquet"), "w") as f:
        f.write("halfwritten")

    actions = recover_optimize_residue(spark, dest)
    assert len(actions) == 2
    assert os.path.exists(victim) and not os.path.exists(legacy_old)
    assert not os.path.exists(legacy_tmp)
    rows_after = sorted(
        (r.o_orderkey, r.o_totalprice, r.year)
        for r in spark.read.parquet(dest).collect()
    )
    assert rows_after == rows_before


def test_snapshot_optimize_columnar_selection_engages(spark, tmp_path):
    """Under the parquet manifest form the incremental OPTIMIZE must
    pick its small-file tail off the sizes COLUMN (r12:
    _small_file_candidates) — engagement asserted, selection equal to
    the scalar _live_sizes path, and the rebased commit correct
    end-to-end (rows preserved, kept files verbatim, fresh stats)."""
    import math

    from aws_logs_parquet_converter_spark import storage as stmod
    from aws_logs_parquet_converter_spark.plans import snapshots as snap
    from aws_logs_parquet_converter_spark.plans.snapshots import (
        read_manifest,
        snapshot_optimize,
        snapshot_read,
        snapshot_write,
    )

    root = str(tmp_path / "t")
    old = stmod.MANIFEST_COMPACT_MIN_BYTES
    stmod.MANIFEST_COMPACT_MIN_BYTES = 200
    engaged = []
    orig = snap._small_file_candidates

    def spy(m, sb):
        r = orig(m, sb)
        engaged.append(r is not None)
        return r

    snap._small_file_candidates = spy
    try:
        for i in range(6):
            snapshot_write(
                spark.range(i * 200, (i + 1) * 200)
                .selectExpr("id", "id * 2 as v")
                .repartition(20),
                root,
                stats_cols=["id"],
            )
        m = read_manifest(spark, root, 6)
        assert isinstance(m.get("sizes"), stmod.LazySection)
        small_bytes = 64 * 1024 * 1024 / 2
        fast = orig(m, small_bytes)
        assert fast is not None, "columnar selection ineligible"
        sizes = snap._live_sizes(spark, root, m)
        want = sorted(f for f in m["files"] if sizes[f] < small_bytes)
        assert fast[0] == want
        assert fast[1] == sum(sizes[f] for f in want)

        v = snapshot_optimize(spark, root, target_file_mb=64)
        assert v == 7
        assert engaged and engaged[-1], "optimize took the scalar path"
        got = snapshot_read(spark, root)
        assert got.count() == 1200
        m7 = read_manifest(spark, root, 7)
        assert len(m7["files"]) < len(m["files"])
        # fresh stats cover every file (kept carried + packed collected)
        assert set(m7["stats"]) == set(m7["files"])
        # repeated run is a no-op
        assert snapshot_optimize(spark, root, target_file_mb=64) is None
    finally:
        snap._small_file_candidates = orig
        stmod.MANIFEST_COMPACT_MIN_BYTES = old
