"""Oracle-checked queries over the log-ETL pipeline ITSELF (O5-O15, O22).

The reference's entire reason to exist — parse raw S3 server-access-log text
into the typed 27-column table, compact it to partitioned parquet, query it
back (``converters/s3-server-access-log/s3_server_access_logs.py:157-228``
parse, ``:442-463`` compact) — gets the same DuckDB-oracle treatment as every
relational operator, closing VERDICT r1 missing-item #1.

How the oracle works without files: a deterministic synthetic corpus
(:mod:`..sources.generator`, seeded) is embedded in BOTH engines —

* Spark parses it with the production native-expression parser
  (:func:`..functions.s3_log_parse.parse_s3_access_log_lines`);
* DuckDB re-parses the SAME lines, inlined as a ``VALUES`` CTE, with its own
  independent regex engine (RE2 ``regexp_extract`` into a 26-group struct,
  ``regexp_matches`` for the dead-letter branch).

Both sides are GENERATED from the one ``_FIELD_SPECS`` table in
``functions/s3_log_parse.py`` (group number, sentinel literal, cast), so the
sentinel->NULL and cast semantics under test cannot silently diverge from the
semantics being tested. Timestamps are compared as ``yyyy-MM-dd HH:mm:ss``
strings — timezone-free, engine-portable (registry determinism rules).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..functions.s3_log_parse import (
    _FIELD_SPECS,
    OUTPUT_COLUMNS,
    S3_ACCESS_LOG_PATTERN,
    parse_s3_access_log_lines,
)
from ..sources.generator import generate_log_lines

# Small enough to inline in SQL, large enough to hit every branch: ~1%
# garbage (dead-letter), ~1% blanks (dropped), sentinel-heavy fields.
N_LINES = 300
SEED = 7
RAW_LINES = tuple(generate_log_lines(N_LINES, seed=SEED))


def _raw_df(spark: SparkSession) -> DataFrame:
    """The corpus as a one-column DataFrame, exactly like spark.read.text."""
    return spark.createDataFrame([(l,) for l in RAW_LINES], "value string")


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_PAT = _q(S3_ACCESS_LOG_PATTERN)
_GROUP_NAMES = ", ".join(f"'g{i}'" for i in range(1, 27))


def _values_cte() -> str:
    return ",\n      ".join(f"({_q(l)})" for l in RAW_LINES)


def _duck_field_exprs() -> list[str]:
    """One SELECT expression per output column, generated from _FIELD_SPECS —
    the same (group, sentinel, cast) table the Spark parser is built from."""
    exprs: list[str] = []
    for name in OUTPUT_COLUMNS:
        if name == "request_time":
            exprs.append(
                "CASE WHEN ok THEN strftime(try_strptime("
                r"regexp_extract(ext.g3, '\[([^\s\]]+)', 1), "
                "'%d/%b/%Y:%H:%M:%S'), '%Y-%m-%d %H:%M:%S') END "
                "AS request_time_str"
            )
        elif name == "error_line":
            exprs.append("CASE WHEN NOT ok THEN line END AS error_line")
        else:
            _n, grp, sentinel, cast = next(s for s in _FIELD_SPECS if s[0] == name)
            e = f"ext.g{grp}"
            if sentinel is not None:
                e = f"NULLIF({e}, {_q(sentinel)})"
            if cast is not None:
                e = f"TRY_CAST({e} AS {'INTEGER' if cast == 'int' else 'BIGINT'})"
            exprs.append(f"CASE WHEN ok THEN {e} END AS {name}")
    return exprs


def _duck_parsed_cte() -> str:
    """WITH-clause prefix producing ``parsed`` = the 27-column typed table."""
    return f"""
    WITH raw(value) AS (VALUES
      {_values_cte()}),
    stripped AS (
      SELECT regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (SELECT line FROM stripped WHERE length(line) > 0),
    matched AS (
      SELECT line,
             regexp_matches(line, {_PAT}) AS ok,
             regexp_extract(line, {_PAT}, [{_GROUP_NAMES}]) AS ext
      FROM nonblank),
    parsed AS (
      SELECT {", ".join(_duck_field_exprs())}
      FROM matched)
    """


def _spark_parsed(spark: SparkSession) -> DataFrame:
    """Production parser over the corpus, request_time rendered as string."""
    parsed = parse_s3_access_log_lines(_raw_df(spark))
    cols = [
        F.date_format("request_time", "yyyy-MM-dd HH:mm:ss").alias("request_time_str")
        if c == "request_time"
        else F.col(c)
        for c in OUTPUT_COLUMNS
    ]
    return parsed.select(*cols)


@register(
    "q_s3log_parse_fields",
    oracle=_duck_parsed_cte() + "SELECT * FROM parsed",
    doc="Row-level parse parity: all 27 output columns of the native-"
    "expression S3 log parser vs an independent DuckDB regex re-parse of "
    "the same raw lines (sentinels, casts, dead-letter, timestamp).",
)
def q_s3log_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_parsed(spark)


@register(
    "q_s3log_parse_stats",
    oracle=_duck_parsed_cte()
    + """
    SELECT http_status,
           COUNT(*) AS n,
           CAST(SUM(bytes_sent) AS BIGINT) AS bytes_total,
           CAST(SUM(total_time) AS BIGINT) AS time_total,
           COUNT(error_line) AS n_dead,
           COUNT(DISTINCT operation) AS n_ops
    FROM parsed
    GROUP BY http_status
    """,
    doc="The canonical downstream Athena query shape over freshly parsed "
    "logs: per-status traffic totals, with dead-letter rows surfacing as "
    "the NULL-status group (queryable bad data, reference §1.5).",
)
def q_s3log_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spark_parsed(spark).groupBy("http_status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bytes_sent").alias("bytes_total"),
        F.sum("total_time").alias("time_total"),
        F.count("error_line").alias("n_dead"),
        F.countDistinct("operation").alias("n_ops"),
    )


@register(
    "q_s3log_compaction_roundtrip",
    oracle=_duck_parsed_cte()
    + """
    SELECT substr(request_time_str, 1, 10) AS day,
           COUNT(*) AS n,
           CAST(SUM(bytes_sent) AS BIGINT) AS bytes_total,
           MIN(request_time_str) AS first_ts,
           MAX(request_time_str) AS last_ts
    FROM parsed
    WHERE error_line IS NULL
    GROUP BY 1
    """,
    doc="Full write-path roundtrip (O12-O15 + O22): parse -> compact to "
    "hive-partitioned parquet (repartition + sortWithinPartitions + "
    "dynamic-overwrite partitionBy) -> re-read from disk -> daily rollup. "
    "The oracle computes the same rollup from the raw lines directly, so "
    "any row lost/duplicated/retyped by the writer-reader pair mismatches.",
)
def q_s3log_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.compact import CompactionPolicy, write_compacted

    parsed = parse_s3_access_log_lines(_raw_df(spark)).where(
        F.col("error_line").isNull()
    )
    # Fresh dir per invocation: a fixed shared path races across concurrent
    # sessions and, with dynamic-overwrite hive writes, lets stale partitions
    # from an older corpus leak into the re-read.
    dest = tempfile.mkdtemp(prefix="spark_graft_logetl_roundtrip_")
    write_compacted(
        parsed,
        dest,
        CompactionPolicy(num_output_files=2, hive_partitioning=True),
    )
    back = spark.read.parquet(dest)
    ts = F.date_format("request_time", "yyyy-MM-dd HH:mm:ss")
    return back.groupBy(F.date_format("request_time", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bytes_sent").alias("bytes_total"),
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# Incremental / backfill driver (O16-O17) under the oracle
# ---------------------------------------------------------------------------

# Three dated folders, each with its own deterministic slice of the corpus —
# the backfill loop must compact each folder into its own dated destination.
DAYS = ("2024-07-01", "2024-07-02", "2024-07-03")
_DAY_LINES = {d: tuple(generate_log_lines(120, seed=100 + i)) for i, d in enumerate(DAYS)}


def _day_values_cte() -> str:
    rows = []
    for d, lines in _DAY_LINES.items():
        rows += [f"({_q(d)}, {_q(l)})" for l in lines]
    return ",\n      ".join(rows)


@register(
    "q_s3log_incremental_backfill",
    oracle=f"""
    WITH raw(folder_day, value) AS (VALUES
      {_day_values_cte()}),
    stripped AS (
      SELECT folder_day,
             regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (SELECT folder_day, line FROM stripped WHERE length(line) > 0),
    matched AS (
      SELECT folder_day, line, regexp_matches(line, {_PAT}) AS ok,
             regexp_extract(line, {_PAT}, [{_GROUP_NAMES}]) AS ext
      FROM nonblank)
    SELECT folder_day,
           COUNT(*) AS n,
           COUNT(CASE WHEN NOT ok THEN 1 END) AS n_dead,
           CAST(SUM(CASE WHEN ok THEN TRY_CAST(NULLIF(ext.g12, '-') AS BIGINT) END)
                AS BIGINT) AS bytes_total
    FROM matched
    GROUP BY folder_day
    """,
    doc="Backfill driver (O16-O17) under the oracle: three dated raw folders "
    "-> one compact_day per date via the start_date loop -> each dated "
    "destination re-read and rolled up, keyed by FOLDER date (the driver's "
    "unit of work), including dead-letter rows shipped to the output.",
)
def q_s3log_incremental_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import date as _date

    from ..plans.compact import CompactionPolicy
    from ..plans.incremental import RollupConfig, run

    root = tempfile.mkdtemp(prefix="spark_graft_logetl_backfill_")
    raw_root = os.path.join(root, "raw")
    out_root = os.path.join(root, "out")
    for d, lines in _DAY_LINES.items():
        day_dir = os.path.join(raw_root, d.replace("-", "/"))
        os.makedirs(day_dir, exist_ok=True)
        with open(os.path.join(day_dir, "access.txt"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")

    cfg = RollupConfig(
        source_root=raw_root,
        destination_root=out_root,
        start_date=DAYS[0],
        lookback_days=1,
        policy=CompactionPolicy(num_output_files=2),
    )
    processed = run(spark, cfg, today=_date(2024, 7, 4))
    assert [d.isoformat() for d in processed] == list(DAYS), processed

    per_day = [
        spark.read.parquet(os.path.join(out_root, d.replace("-", "/"))).select(
            F.lit(d).alias("folder_day"), "bytes_sent", "error_line"
        )
        for d in DAYS
    ]
    union = per_day[0]
    for p in per_day[1:]:
        union = union.unionByName(p)
    return union.groupBy("folder_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("error_line").alias("n_dead"),
        F.sum("bytes_sent").alias("bytes_total"),
    )


@register(
    "q_s3log_external_table",
    oracle=_duck_parsed_cte()
    + """
    SELECT CAST(substr(request_time_str, 1, 4) AS INTEGER) AS year,
           CAST(substr(request_time_str, 6, 2) AS INTEGER) AS month,
           CAST(substr(request_time_str, 9, 2) AS INTEGER) AS day,
           COUNT(*) AS n,
           CAST(SUM(bytes_sent) AS BIGINT) AS bytes_total
    FROM parsed
    WHERE error_line IS NULL
      AND CAST(substr(request_time_str, 9, 2) AS INTEGER) <= 15
    GROUP BY 1, 2, 3
    """,
    doc="External SQL table over compacted output (O22) with partition "
    "pruning (O23, the Athena partition-projection analog): compact to "
    "hive layout, CREATE TABLE ... USING parquet + MSCK REPAIR, then a "
    "pruned WHERE day <= 15 aggregate via spark.sql. The oracle computes "
    "the same rollup from the raw lines. On sessions without a writable "
    "metastore the same query runs over the path-discovered partition "
    "columns directly (identical semantics; pruning still directory-level).",
)
def q_s3log_external_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import register_compacted_table
    from ..plans.compact import CompactionPolicy, write_compacted

    parsed = parse_s3_access_log_lines(_raw_df(spark)).where(
        F.col("error_line").isNull()
    )
    dest = tempfile.mkdtemp(prefix="spark_graft_logetl_exttable_")
    write_compacted(
        parsed,
        dest,
        CompactionPolicy(num_output_files=2, hive_partitioning=True),
    )
    table = "s3log_ext_gate"
    try:
        register_compacted_table(spark, table, dest, partitioned=True)
        back = spark.table(table)
    except Exception:
        # No writable metastore (e.g. read-only cwd for derby): identical
        # semantics via the path-discovery reader; WHERE on the partition
        # columns still prunes directories.
        back = spark.read.parquet(dest)
    y, m, d = (F.col(c).cast("int").alias(c) for c in ("year", "month", "day"))
    return (
        back.select(y, m, d, "bytes_sent")
        .where(F.col("day").cast("int") <= 15)
        .groupBy("year", "month", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes_sent").alias("bytes_total"))
    )


# ---------------------------------------------------------------------------
# Multi-folder (per-logged-bucket) run under the oracle
# ---------------------------------------------------------------------------

# Two logged-bucket folders x two days, each cell its own deterministic
# slice — ONE driver invocation must discover both folders and compact every
# (folder, day) cell into its own destination subtree, like the reference's
# per-bucket loop (s3_server_access_logs.py:335-351 discovery, :445-454
# per-bucket destinations).
FOLDERS = ("logs-bucket-a", "logs-bucket-b")
MF_DAYS = ("2024-08-01", "2024-08-02")
_MF_LINES = {
    (f, d): tuple(generate_log_lines(60, seed=300 + 10 * fi + di))
    for fi, f in enumerate(FOLDERS)
    for di, d in enumerate(MF_DAYS)
}


def _mf_values_cte() -> str:
    rows = []
    for (f, d), lines in _MF_LINES.items():
        rows += [f"({_q(f)}, {_q(d)}, {_q(l)})" for l in lines]
    return ",\n      ".join(rows)


@register(
    "q_s3log_multi_folder",
    oracle=f"""
    WITH raw(folder, folder_day, value) AS (VALUES
      {_mf_values_cte()}),
    stripped AS (
      SELECT folder, folder_day,
             regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (
      SELECT folder, folder_day, line FROM stripped WHERE length(line) > 0),
    matched AS (
      SELECT folder, folder_day, line, regexp_matches(line, {_PAT}) AS ok,
             regexp_extract(line, {_PAT}, [{_GROUP_NAMES}]) AS ext
      FROM nonblank)
    SELECT folder, folder_day,
           COUNT(*) AS n,
           COUNT(CASE WHEN NOT ok THEN 1 END) AS n_dead,
           CAST(SUM(CASE WHEN ok THEN TRY_CAST(NULLIF(ext.g12, '-') AS BIGINT) END)
                AS BIGINT) AS bytes_total
    FROM matched
    GROUP BY folder, folder_day
    """,
    doc="Multi-folder driver run under the oracle: two logged-bucket "
    "folders x two dated raw dirs -> ONE run() invocation with filesystem "
    "folder discovery (folders=None) compacts all four (folder, day) cells "
    "into per-folder destination subtrees -> each subtree re-read and "
    "rolled up keyed by (folder, day). Mirrors the reference's per-bucket "
    "loop (s3_server_access_logs.py:335-351, :445-454).",
)
def q_s3log_multi_folder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import date as _date

    from ..plans.compact import CompactionPolicy
    from ..plans.incremental import RollupConfig, run

    root = tempfile.mkdtemp(prefix="spark_graft_logetl_multifolder_")
    raw_root = os.path.join(root, "raw")
    out_root = os.path.join(root, "out")
    for (f, d), lines in _MF_LINES.items():
        day_dir = os.path.join(raw_root, f, d.replace("-", "/"))
        os.makedirs(day_dir, exist_ok=True)
        with open(os.path.join(day_dir, "access.txt"), "w", encoding="utf-8") as fh:
            fh.write("\n".join(lines) + "\n")

    cfg = RollupConfig(
        source_root=raw_root,
        destination_root=out_root,
        start_date=MF_DAYS[0],
        lookback_days=1,
        policy=CompactionPolicy(num_output_files=2),
        folders=None,  # discover logged-bucket folders from the filesystem
    )
    processed = run(spark, cfg, today=_date(2024, 8, 3))
    assert [d.isoformat() for d in processed] == list(MF_DAYS), processed

    parts = [
        spark.read.parquet(os.path.join(out_root, f, d.replace("-", "/"))).select(
            F.lit(f).alias("folder"),
            F.lit(d).alias("folder_day"),
            "bytes_sent",
            "error_line",
        )
        for f in FOLDERS
        for d in MF_DAYS
    ]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return union.groupBy("folder", "folder_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("error_line").alias("n_dead"),
        F.sum("bytes_sent").alias("bytes_total"),
    )
