import os

import pytest

# Mock-S3 plumbing for the s3:// end-to-end tests (tests/test_s3_moto.py):
# boto3 resolves AWS_ENDPOINT_URL_S3 / credentials from the ENVIRONMENT at
# client build time, and Python DataSource workers inherit the JVM's env,
# which inherits ours — but only if these are set BEFORE the JVM launches.
# Setting them unconditionally is harmless: nothing else speaks boto3, and
# the port is only served while a moto server fixture is up.
os.environ.setdefault("AWS_ENDPOINT_URL_S3", "http://127.0.0.1:5191")
os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")

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
