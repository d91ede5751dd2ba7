"""SparkSession factory with scale-oriented defaults.

The reference builds its session at
``converters/s3-server-access-log/s3_server_access_logs.py:50-69`` (app name,
speculation off, TIMESTAMP_MILLIS parquet timestamps, committer algorithm v2).
We keep the semantically relevant pieces (timestamp physical type, speculation)
and add what a Catalyst-native engine should always run with: AQE (runtime
coalescing + skew-join handling), a UTC session zone (deterministic timestamp
semantics across engines), and Arrow for any pandas-UDF exchange.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "aws_logs_parquet_converter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession tuned for this engine.

    On a real cluster ``master`` is left to spark-submit; locally we default to
    ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    # managed-table warehouse (bucketed tables) outside the repo tree
    import tempfile

    warehouse = os.path.join(tempfile.gettempdir(), f"spark-warehouse-{os.getpid()}")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- semantics ----------------------------------------------------
        # Millisecond parquet timestamps for Athena/engine interop
        # (reference: s3_server_access_logs.py:60-61).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        # Deterministic, engine-portable timestamp arithmetic.
        .config("spark.sql.session.timeZone", "UTC")
        # No duplicate S3 writes from speculative tasks
        # (reference: s3_server_access_logs.py:59).
        .config("spark.speculation", "false")
        # -- scale --------------------------------------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for pandas-UDF / toPandas exchange.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Parquet TIMESTAMP(NANOS) (events.ts) is illegal for Spark's reader;
        # read as long and convert in the catalog (catalog.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Small-file coalescing on read: a 100 TB log corpus is millions of
        # small objects; openCostInBytes packs them into sane splits.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.files.openCostInBytes", "4194304")
        # Managed tables (bucketed joins) live in tmp; derby metastore too.
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={warehouse}")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return spark
