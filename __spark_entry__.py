"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the engine's operator registry
(aws_logs_parquet_converter_spark.operators.REGISTRY) — every implemented
operator is a named query with (when SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aws_logs_parquet_converter_spark import operators

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Daily per-type event rollup — the canonical shape the reference pipeline
    exists to enable (daily request counts / error rates over parsed logs).
    """
    from aws_logs_parquet_converter_spark.operators.relational import q_events_daily

    return q_events_daily(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return operators.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return operators.all_oracles()
