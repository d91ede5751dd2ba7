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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long nanos
        # (spark.sql.legacy.parquet.nanosAsLong); truncate to micros exactly
        # like DuckDB/Arrow do and restore a timestamp column.
        field = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)
        if field.get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


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
