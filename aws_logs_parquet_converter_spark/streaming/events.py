"""Structured Streaming over the events stream.

The reference emulates streaming as a daily batch over date folders
(``s3_server_access_logs.py:361-371``); here the same incremental semantics
are expressed natively: a file-source stream + watermarked event-time windows,
runnable continuously or as ``trigger(availableNow=True)`` catch-up batches
(the modern equivalent of the reference's daily EventBridge cron).

All aggregations are watermarked so state is bounded: late events beyond the
watermark are dropped (documented policy; the reference handles late data by
re-running a whole day instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "json") -> DataFrame:
    """File-source stream of events (schema fixed up front — no inference)."""
    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA).format(fmt)
    if fmt == "json":
        reader = reader.option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
    return reader.load(path)


def windowed_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window counts per type, bounded by a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionized(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows per user: events merge while gaps stay under ``gap``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("session_start"), "user_id", "n_events")
    )


def run_available_now(
    result: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str = "update"
) -> StreamingQuery:
    """Catch-up batch over all pending files -> in-memory table ``query_name``."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
