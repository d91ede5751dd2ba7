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


def test_optimize_survives_crashed_prior_run_residue(spark, tmp_path):
    """Hadoop rename() reports failure by return value; a crashed prior run
    leaves a __optimize_old directory that would silently no-op the swap.
    The hardened swap clears the residue, still rewrites, and preserves
    content."""
    dest = str(tmp_path / "tbl")
    _seed(spark, dest)
    n_before = spark.read.parquet(dest).count()
    stats = partition_file_stats(spark, dest, "year")
    residue = stats[0].path + "__optimize_old/junk"
    os.makedirs(residue, exist_ok=True)
    with open(os.path.join(residue, "x"), "w") as f:
        f.write("stale")

    rewritten = optimize_partitions(spark, dest, "year", target_file_mb=128)
    assert stats[0].value in rewritten
    assert not os.path.exists(stats[0].path + "__optimize_old")
    assert spark.read.parquet(dest).count() == n_before
