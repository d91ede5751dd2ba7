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

#: Version of the hadoop-aws module matched to the Spark build's Hadoop
#: (Spark 4.x ships Hadoop 3.4); override via SPARK_GRAFT_HADOOP_AWS_VERSION
#: when running against a different Hadoop line.
_HADOOP_AWS_VERSION_DEFAULT = "3.4.1"


def cloud_conf(committer: str = "v2") -> dict[str, str]:
    """Spark confs for writing to object storage (``s3a://`` roots).

    The reference job ships ``hadoop-aws`` and sets fileoutputcommitter
    **algorithm v2** so task commits rename directly into the destination
    instead of a second sequential job-commit rename pass — on S3 (no
    atomic rename) v1's job-commit is both slow and a correctness hazard
    (``converters/s3-server-access-log/s3_server_access_logs.py:62-68``).

    ``committer="v2"`` reproduces that. ``committer="magic"`` selects the
    modern S3A magic committer (zero-rename, writes tasks straight to the
    final location via multipart uploads; requires S3A, not file://).

    Credentials: no keys are ever placed in Spark conf. The S3A default
    provider chain (env vars -> profile -> instance/IAM role) resolves
    identity exactly like the reference's env-vs-IAM branch
    (``s3_server_access_logs.py:37-47``) — to force a specific path set
    ``spark.hadoop.fs.s3a.aws.credentials.provider`` in ``extra_conf``.
    """
    ver = os.environ.get("SPARK_GRAFT_HADOOP_AWS_VERSION", _HADOOP_AWS_VERSION_DEFAULT)
    packages = [f"org.apache.hadoop:hadoop-aws:{ver}"]
    if committer == "magic":
        # The PathOutputCommitProtocol / BindingParquetOutputCommitter classes
        # live in the optional spark-hadoop-cloud module, which the pyspark
        # wheel does NOT bundle — without this package the first write fails
        # with ClassNotFoundException.  Version-match it to the running Spark.
        import pyspark

        scala = os.environ.get("SPARK_GRAFT_SCALA_SUFFIX", "2.13")
        packages.append(
            f"org.apache.spark:spark-hadoop-cloud_{scala}:{pyspark.__version__}"
        )
    conf = {
        "spark.jars.packages": ",".join(packages),
        # Upload blocks from memory-bounded disk buffers; sane multipart size.
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.multipart.size": "67108864",
        # Directory listing at scale: async prefetching of list pages.
        "spark.hadoop.fs.s3a.paging.maximum": "1000",
    }
    if committer == "magic":
        conf.update(
            {
                "spark.hadoop.fs.s3a.committer.name": "magic",
                "spark.hadoop.fs.s3a.committer.magic.enabled": "true",
                "spark.sql.parquet.output.committer.class": (
                    "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
                ),
                "spark.sql.sources.commitProtocolClass": (
                    "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
                ),
            }
        )
    elif committer == "v2":
        conf["spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version"] = "2"
    else:
        raise ValueError(f"unknown committer {committer!r}; expected 'v2' or 'magic'")
    return conf


def build_session(
    app_name: str = "aws_logs_parquet_converter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    cloud: bool = False,
    committer: str = "v2",
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
        # Iterative operators (components, k-means, star rounds) retire
        # per-round localCheckpoint blocks only after a DRIVER GC lets the
        # ContextCleaner see the dropped references; Spark's default
        # periodic GC (30min) lags long multi-sweep drivers — the graph
        # decade probe OOM'd a 24g heap on accumulated live blocks
        # (SCALE.md round-7). 5min keeps block retirement ahead of churn.
        .config("spark.cleaner.periodicGC.interval", "5min")
        # Managed tables (bucketed joins) live in tmp; derby metastore too.
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={warehouse}")
        # Task commits rename directly into the destination (reference
        # parity: s3_server_access_logs.py:65-68); harmless on file://,
        # load-bearing on object stores. cloud=True upgrades the committer
        # and ships hadoop-aws (see cloud_conf).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    if cloud:
        for k, v in cloud_conf(committer=committer).items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # every spark.read.text over a glob logs a WARN + full
    # FileNotFoundException stack from FileStreamSink.hasMetadata probing
    # the glob as a literal path (SPARK-24157 fallout; cosmetic, fires on
    # each batch read of globbed logs). Raise that one logger to ERROR so
    # operational tails stay legible.
    try:
        jvm = spark.sparkContext._jvm
        for logger in (
            # Spark 4 package; pre-4 name kept for older deployments
            "org.apache.spark.sql.execution.streaming.sinks.FileStreamSink",
            "org.apache.spark.sql.execution.streaming.FileStreamSink",
        ):
            jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
                logger, jvm.org.apache.logging.log4j.Level.ERROR
            )
    except Exception:
        pass  # non-log4j2 deployments: the warn is cosmetic anyway
    return spark
