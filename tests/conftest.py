import pytest

from aws_logs_parquet_converter_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield spark
    spark.stop()
