import os

import pytest

from aws_logs_parquet_converter_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    if os.environ.get("SPARK_GRAFT_VANILLA") == "1":
        # Mirror the external driver's harness: a bare SparkSession with none
        # of build_session's confs (no nanosAsLong, no AQE tweaks, no UTC).
        # Every registered query must work on this session too.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[4]")
            .appName("engine-tests-vanilla")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "4g")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        spark = build_session(
            app_name="engine-tests",
            master="local[4]",
            shuffle_partitions=4,
            extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
        )
    yield spark
    spark.stop()
