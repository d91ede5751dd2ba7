"""Table catalog over the driver-provided parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Make TIMESTAMP(NANOS) parquet readable on ANY session.

    ``events.parquet`` carries a physical INT64 TIMESTAMP(NANOS,false) column;
    without ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark raises
    PARQUET_TYPE_ILLEGAL at read time.  Our own ``build_session`` sets the
    conf, but callers (e.g. an external harness) may hand us a vanilla
    SparkSession — so set it here at runtime (it is a runtime SQLConf, not a
    static one) instead of relying on session construction.
    """
    try:
        if spark.conf.get(_NANOS_CONF, "false") != "true":
            spark.conf.set(_NANOS_CONF, "true")
    except Exception:
        # Conf rejected (e.g. removed in a future Spark) — the schema-based
        # fallback in load_table still applies.
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = table_path(sf_dir, name)
    if name != "events":
        return spark.read.parquet(path)
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long nanos
    # once nanosAsLong is set; truncate to micros exactly like DuckDB/Arrow
    # do and restore a timestamp column.
    _ensure_nanos_conf(spark)
    try:
        df = spark.read.parquet(path)
    except Exception:
        # Fallback for sessions where the conf could not take effect: read
        # with an explicit schema typing ts as long nanos.
        df = spark.read.schema(_events_long_schema(spark, path)).parquet(path)
    field = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
    if field.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _events_long_schema(spark: SparkSession, path: str):
    """Explicit events schema with ts as LongType, derived from the parquet
    footer via pyarrow (driver-side metadata read only — no data scan)."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    arrow_schema = pq.read_schema(_first_parquet_file(path))
    fields = []
    for name in arrow_schema.names:
        at = arrow_schema.field(name).type
        if str(at).startswith("timestamp"):
            fields.append(T.StructField(name, T.LongType()))
        else:
            # Let Spark map the remaining primitives; they are all plain
            # int64/float64/string/binary in the testdata tables.
            fields.append(T.StructField(name, _arrow_to_spark_type(at)))
    return T.StructType(fields)


def _first_parquet_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no parquet files under {path}")


def _arrow_to_spark_type(at):
    import pyarrow as pa
    from pyspark.sql import types as T

    if pa.types.is_int64(at):
        return T.LongType()
    if pa.types.is_int32(at):
        return T.IntegerType()
    if pa.types.is_float64(at):
        return T.DoubleType()
    if pa.types.is_float32(at):
        return T.FloatType()
    if pa.types.is_string(at) or pa.types.is_large_string(at):
        return T.StringType()
    if pa.types.is_binary(at) or pa.types.is_large_binary(at):
        return T.BinaryType()
    if pa.types.is_boolean(at):
        return T.BooleanType()
    if pa.types.is_date(at):
        return T.DateType()
    if pa.types.is_decimal(at):
        return T.DecimalType(at.precision, at.scale)
    if pa.types.is_list(at) or pa.types.is_large_list(at):
        return T.ArrayType(_arrow_to_spark_type(at.value_type))
    return T.StringType()


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table as a DataFrame (lazy — no scan yet)."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def register_compacted_table(
    spark: SparkSession, name: str, location: str, partitioned: bool = True
) -> None:
    """Register compacted parquet output as a SQL-queryable external table —
    the Spark-SQL analog of the reference's Athena DDL
    (``converters/s3-server-access-log/example_sql/athena_create_table.sql:1-47``,
    external table + partition projection over the produced parquet).

    Schema comes from the parquet footers; for hive-partitioned layouts
    (``CompactionPolicy(hive_partitioning=True)``) partition columns are
    discovered from the directory tree and ``MSCK REPAIR`` (recover
    partitions) loads them into the catalog, after which
    ``WHERE year=... AND month=... AND day=...`` prunes directories exactly
    like Athena partition projection — no data files are listed outside the
    matching partitions.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{location}'")
    if partitioned:
        spark.sql(f"MSCK REPAIR TABLE {name}")
