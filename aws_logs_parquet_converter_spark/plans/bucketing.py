"""Bucketed-table write policy: co-located joins and aggregations.

At 100 TB the single biggest shuffle in the system is the fact-fact join
(orders x lineitem shapes). Bucketing both tables BY THE JOIN KEY into the
same bucket count at write time moves that shuffle from every query to a
one-time cost at ingest: Spark's bucketed scan exposes the hash
distribution, so a join or groupBy on the bucket key plans with NO Exchange
on either side (asserted in tests/test_plans.py).

Policy guidance at scale:
* bucket count ~= total_size / 256 MB, rounded to a power of two; both join
  sides MUST use the same count (or integer multiples with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled).
* sortBy(join_key) inside buckets upgrades the join to a merge join with no
  sort step and gives parquet min/max clustering for free.
* Hive-compatible layout is not attempted — these are Spark-native bucketed
  tables (the reference's Athena interop would instead use its partitioned
  path layout, plans/compact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Save ``df`` as a managed parquet table bucketed (and in-bucket
    sorted) by ``bucket_key``.

    Robust to a stale warehouse: a table directory left behind by a
    PREVIOUS session's metastore is invisible to this metastore (fresh
    derby), but still blocks the managed location with
    LOCATION_ALREADY_EXISTS — drop the catalog entry AND clear the
    leftover local directory before writing.

    Limitation (deliberate): the stale-location sweep only handles local
    ``file:`` warehouses and assumes the default-database layout
    (``<warehouse>/<table>``). On a cloud warehouse (``s3a://``) or with
    db-qualified table names the LOCATION_ALREADY_EXISTS hazard remains —
    there the location should be resolved via
    ``spark.catalog.getTable(table)`` / ``DESCRIBE TABLE EXTENDED`` and
    cleared with the store's own API, which this test-gate helper does not
    attempt.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    local = warehouse.removeprefix("file:")
    if local.startswith("/"):
        import os
        import shutil

        shutil.rmtree(os.path.join(local, table.lower()), ignore_errors=True)
    writer = (
        df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, bucket_key)
    )
    if sort:
        writer = writer.sortBy(bucket_key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_left: str, key_right: str
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — plans with
    zero Exchange nodes (shuffle happened once, at write time)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[key_left] == right[key_right])
