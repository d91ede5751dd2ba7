"""Retention sweep: expired partitions vanish, survivors are untouched."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from aws_logs_parquet_converter_spark.plans.retention import (
    expire_partitions,
    list_partitions,
)


def _write_partitioned(spark, dest):
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 5) + 1:02d}") for i in range(50)], "id bigint, day string"
    )
    df.write.mode("overwrite").partitionBy("day").parquet(dest)


def test_expire_drops_old_keeps_new_untouched(spark):
    dest = tempfile.mkdtemp(prefix="retention_")
    _write_partitioned(spark, dest)
    assert list_partitions(spark, dest, "day") == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04", "2024-01-05",
    ]
    survivors_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{dest}/day=2024-01-0[3-5]/*.parquet")
    }

    expired = expire_partitions(spark, dest, "day", keep_from="2024-01-03")
    assert expired == ["2024-01-01", "2024-01-02"]
    assert list_partitions(spark, dest, "day") == [
        "2024-01-03", "2024-01-04", "2024-01-05",
    ]
    # survivor files byte-identical (never rewritten, never even opened)
    for p, mt in survivors_before.items():
        assert os.path.getmtime(p) == mt

    # table still reads cleanly and holds exactly the surviving rows
    left = spark.read.parquet(dest)
    assert left.count() == 30
    # partition type inference reads `day` back as DATE; compare as string
    assert str(left.agg(F.min("day")).first()[0]) == "2024-01-03"

    # idempotent: same horizon deletes nothing more
    assert expire_partitions(spark, dest, "day", keep_from="2024-01-03") == []


def test_expire_on_missing_dest_is_noop(spark):
    assert expire_partitions(spark, "/tmp/retention_nonexistent_xyz", "day", "2024") == []


def test_expire_date_partitions_plain_and_hive(spark):
    import datetime as dt

    for hive in (False, True):
        dest = tempfile.mkdtemp(prefix="retention_date_")
        fmt = (
            (lambda d: f"year={d.year:04d}/month={d.month:02d}/day={d.day:02d}")
            if hive
            else (lambda d: f"{d.year:04d}/{d.month:02d}/{d.day:02d}")
        )
        days = [dt.date(2023, 12, 30), dt.date(2023, 12, 31),
                dt.date(2024, 1, 1), dt.date(2024, 1, 2)]
        for d in days:
            p = os.path.join(dest, fmt(d))
            os.makedirs(p)
            with open(os.path.join(p, "part-0.parquet"), "wb") as fh:
                fh.write(b"x")
        from aws_logs_parquet_converter_spark.plans.retention import (
            expire_date_partitions,
        )

        expired = expire_date_partitions(
            spark, dest, dt.date(2024, 1, 2), hive=hive
        )
        # 2023 expires as ONE whole-year delete (early pruning), then Jan 1
        assert expired == ["2023", "2024-01-01"], (hive, expired)
        leaf = "year=2024/month=01/day=02" if hive else "2024/01/02"
        assert os.path.exists(os.path.join(dest, leaf, "part-0.parquet"))
        assert not os.path.exists(os.path.join(dest, "2023" if not hive else "year=2023"))
        # idempotent
        assert expire_date_partitions(spark, dest, dt.date(2024, 1, 2), hive=hive) == []


def test_cli_retain_days_flag_parses():
    from aws_logs_parquet_converter_spark.cli import parse_arguments

    args = parse_arguments(["--source-root", "/tmp/x", "--retain-days", "30"])
    assert args.retain_days == 30
    assert parse_arguments(["--source-root", "/tmp/x"]).retain_days is None
