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
