"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference log->Parquet compaction pipeline
(PebblePost/aws-logs-parquet-converter), rebuilt Spark-first.

Layout:
    session.py    -- tuned SparkSession builder (AQE, UTC, TIMESTAMP_MILLIS)
    catalog.py    -- testdata table loading / temp-view registration
    functions/    -- expression builders (log parse, text, vectors)
    sources/      -- readers (raw log lines, parquet tables, synthetic gen)
    operators/    -- query library (relational pack + dedup/similarity/text)
    plans/        -- write policies, compaction, incremental drivers
    streaming/    -- Structured Streaming jobs over the events table

Everything is DataFrame-native: parsing, filtering and aggregation stay in
Catalyst/Tungsten (whole-stage codegen); Python only appears as Arrow-batched
pandas UDFs where Spark has no native expression.
"""

__version__ = "0.1.0"
