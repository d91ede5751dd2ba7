"""Oracle-checked parse-parity queries for the NON-S3 log formats.

Same technique as :mod:`.logetl` (which covers the S3 server-access-log
format): a deterministic seeded corpus is embedded in both engines — Spark
runs the production native-expression parser, DuckDB re-parses the SAME
lines (inlined as a ``VALUES`` CTE) with independent primitives — and both
sides are GENERATED from the one ``_FIELDS`` spec table per format, so the
semantics under test cannot drift from the oracle.

Formats covered (the converter family the reference names as its roadmap but
never shipped, ``/root/reference/README.md:11``):

* **ALB** (:mod:`..functions.alb_log_parse`) — 29-group regex, quoted-field
  unquoting, ISO8601 timestamps compared as epoch micros (timezone-free in
  both engines regardless of session zone).
* **VPC Flow v2** (:mod:`..functions.vpc_flow_parse`) — strict space-split,
  epoch-seconds timestamps compared as the raw BIGINT.
* **CloudFront standard** (:mod:`..functions.cloudfront_log_parse`) —
  tab-split W3C extended format, ``#`` comment lines dropped, date+time
  fused and compared as a wall-clock string (naive, like the S3 format).

Row-level comparisons over every typed column — any sentinel, cast, quote,
arity or dead-letter divergence between the parser and an independent
implementation of the public format spec mismatches the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register
from ..functions.alb_log_parse import (
    _FIELDS as ALB_FIELDS,
    ALB_LOG_PATTERN,
    parse_alb_log_lines,
)
from ..functions.cloudfront_log_parse import (
    _FIELDS as CF_FIELDS,
    parse_cloudfront_log_lines,
)
from ..functions.vpc_flow_parse import (
    _FIELDS as VPC_FIELDS,
    _N_FIELDS as VPC_N_FIELDS,
    parse_vpc_flow_lines,
)
from ..sources.generator import (
    generate_alb_lines,
    generate_cloudfront_lines,
    generate_vpc_flow_lines,
)

SEED = 7


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _values_cte(lines: tuple[str, ...]) -> str:
    return ",\n      ".join(f"({_q(l)})" for l in lines)


# ---------------------------------------------------------------------------
# ALB
# ---------------------------------------------------------------------------

ALB_LINES = tuple(generate_alb_lines(150, seed=SEED))
_ALB_GROUPS = ", ".join(f"'g{i}'" for i in range(1, len(ALB_FIELDS) + 1))


def _alb_field_exprs() -> list[str]:
    exprs = []
    for i, (name, quoted, cast) in enumerate(ALB_FIELDS):
        e = f"ext.g{i + 1}"
        if quoted:
            e = f"trim({e}, '\"')"
        e = f"NULLIF({e}, '-')"
        if cast == "timestamp":
            e = f"epoch_us(TRY_CAST({e} AS TIMESTAMP))"
            name = f"{name}_us"
        elif cast is not None:
            t = {"int": "INTEGER", "bigint": "BIGINT", "double": "DOUBLE"}[cast]
            e = f"TRY_CAST({e} AS {t})"
        exprs.append(f"CASE WHEN ok THEN {e} END AS {name}")
    exprs.append("CASE WHEN NOT ok THEN line END AS error_line")
    return exprs


# Shared with the streaming ALB compaction gate (streaming/events.py),
# which re-parses the SAME corpus through the file-stream path.
ALB_PARSE_ORACLE = f"""
    WITH raw(value) AS (VALUES
      {_values_cte(ALB_LINES)}),
    stripped AS (
      SELECT regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (SELECT line FROM stripped WHERE length(line) > 0),
    matched AS (
      SELECT line,
             regexp_matches(line, {_q(ALB_LOG_PATTERN)}) AS ok,
             regexp_extract(line, {_q(ALB_LOG_PATTERN)}, [{_ALB_GROUPS}]) AS ext
      FROM nonblank)
    SELECT {", ".join(_alb_field_exprs())} FROM matched
    """


def alb_parity_columns() -> list:
    """Comparable projection of a parsed-ALB frame: every typed column,
    timestamps as epoch micros, plus the dead-letter line."""
    cols = []
    for name, _quoted, cast in ALB_FIELDS:
        if cast == "timestamp":
            cols.append(F.unix_micros(F.col(name)).alias(f"{name}_us"))
        else:
            cols.append(F.col(name))
    cols.append(F.col("error_line"))
    return cols


@register(
    "q_alb_parse_fields",
    oracle=ALB_PARSE_ORACLE,
    doc="Row-level ALB parse parity: all 29 typed columns of the native-"
    "expression parser vs an independent DuckDB regex re-parse of the same "
    "lines; ISO8601 timestamps compared as epoch micros.",
)
def q_alb_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame([(l,) for l in ALB_LINES], "value string")
    parsed = parse_alb_log_lines(raw)
    return parsed.select(*alb_parity_columns())


# ---------------------------------------------------------------------------
# VPC Flow v2
# ---------------------------------------------------------------------------

VPC_LINES = tuple(generate_vpc_flow_lines(200, seed=SEED))


def _vpc_field_exprs() -> list[str]:
    exprs = []
    for i, (name, cast) in enumerate(VPC_FIELDS):
        e = f"NULLIF(tok[{i + 1}], '-')"
        if cast == "epoch":
            e = f"TRY_CAST({e} AS BIGINT)"
            name = f"{name}_epoch"
        elif cast is not None:
            t = {"int": "INTEGER", "bigint": "BIGINT"}[cast]
            e = f"TRY_CAST({e} AS {t})"
        exprs.append(f"CASE WHEN ok THEN {e} END AS {name}")
    exprs.append("CASE WHEN NOT ok THEN line END AS error_line")
    return exprs


# Shared with the streaming VPC-flow compaction gate (streaming/events.py)
VPC_PARSE_ORACLE = f"""
    WITH raw(value) AS (VALUES
      {_values_cte(VPC_LINES)}),
    stripped AS (
      SELECT regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (SELECT line FROM stripped WHERE length(line) > 0),
    split_lines AS (
      SELECT line, string_split(line, ' ') AS tok,
             len(string_split(line, ' ')) = {VPC_N_FIELDS} AS ok
      FROM nonblank)
    SELECT {", ".join(_vpc_field_exprs())} FROM split_lines
    """


def vpc_parity_columns() -> list:
    """Comparable projection of a parsed VPC-flow frame: typed columns,
    epoch timestamps as raw BIGINT seconds, plus the dead-letter line."""
    cols = []
    for name, cast in VPC_FIELDS:
        if cast == "epoch":
            # TimestampType holds the instant; cast("long") is its epoch
            # seconds, timezone-free in both engines.
            cols.append(F.col(name).cast("long").alias(f"{name}_epoch"))
        else:
            cols.append(F.col(name))
    cols.append(F.col("error_line"))
    return cols


@register(
    "q_vpcflow_parse_fields",
    oracle=VPC_PARSE_ORACLE,
    doc="Row-level VPC-flow parse parity: strict space-split arity check, "
    "sentinel NULLs (incl. NODATA records), typed casts; epoch timestamps "
    "compared as the raw BIGINT seconds.",
)
def q_vpcflow_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame([(l,) for l in VPC_LINES], "value string")
    parsed = parse_vpc_flow_lines(raw)
    return parsed.select(*vpc_parity_columns())


# ---------------------------------------------------------------------------
# CloudFront standard logs
# ---------------------------------------------------------------------------

CF_LINES = tuple(generate_cloudfront_lines(150, seed=SEED))


def _cf_field_exprs() -> list[str]:
    exprs = [
        # date + time fused, naive wall-clock (format is UTC by definition)
        "CASE WHEN ok THEN strftime(try_strptime("
        "NULLIF(tok[1], '-') || ' ' || NULLIF(tok[2], '-'), "
        "'%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') END AS request_ts_str"
    ]
    for i, (name, cast) in enumerate(CF_FIELDS):
        e = f"NULLIF(tok[{i + 3}], '-')"
        if cast is not None:
            t = {"int": "INTEGER", "bigint": "BIGINT", "double": "DOUBLE"}[cast]
            e = f"TRY_CAST({e} AS {t})"
        exprs.append(f"CASE WHEN ok THEN {e} END AS {name}")
    exprs.append("CASE WHEN NOT ok THEN line END AS error_line")
    return exprs


# Shared with the streaming CloudFront compaction gate (streaming/events.py)
CF_PARSE_ORACLE = f"""
    WITH raw(value) AS (VALUES
      {_values_cte(CF_LINES)}),
    records AS (
      SELECT value AS line FROM raw
      WHERE length(trim(value)) > 0 AND NOT starts_with(ltrim(value), '#')),
    split_lines AS (
      SELECT line, string_split(line, chr(9)) AS tok,
             len(string_split(line, chr(9))) = {2 + len(CF_FIELDS)} AS ok
      FROM records)
    SELECT {", ".join(_cf_field_exprs())} FROM split_lines
    """


def cf_parity_columns() -> list:
    """Comparable projection of a parsed CloudFront frame: fused date+time
    as a wall-clock string, typed columns, dead-letter line."""
    cols = [
        F.date_format("request_ts", "yyyy-MM-dd HH:mm:ss").alias("request_ts_str")
    ]
    cols += [F.col(name) for name, _cast in CF_FIELDS]
    cols.append(F.col("error_line"))
    return cols


@register(
    "q_cloudfront_parse_fields",
    oracle=CF_PARSE_ORACLE,
    doc="Row-level CloudFront parse parity: tab-split W3C format, '#' "
    "comment lines dropped (not dead-lettered), date+time fused into one "
    "timestamp compared as a wall-clock string.",
)
def q_cloudfront_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame([(l,) for l in CF_LINES], "value string")
    parsed = parse_cloudfront_log_lines(raw)
    return parsed.select(*cf_parity_columns())


# ---------------------------------------------------------------------------
# CloudTrail (JSON-lines)
# ---------------------------------------------------------------------------

from ..functions.cloudtrail_parse import (
    _FIELDS as CT_FIELDS,
    parse_cloudtrail_lines,
)
from ..sources.generator import generate_cloudtrail_lines

CT_LINES = tuple(generate_cloudtrail_lines(120, seed=SEED, garbage_every=29))


def _ct_field_exprs(good: bool) -> list[str]:
    """Per-field DuckDB expressions generated from the one CT_FIELDS
    spec: good rows extract from the unnested record, bad rows emit
    typed NULLs so the UNION branches line up column-for-column."""
    exprs = []
    for name, path, cast in CT_FIELDS:
        if cast == "timestamp":
            e = (
                f"epoch_us(TRY_CAST(json_extract_string(rec, '$.{path}') "
                "AS TIMESTAMP))"
                if good
                else "CAST(NULL AS BIGINT)"
            )
            name = f"{name}_us"
        elif cast == "bool":
            # compared as 'true'/'false' text: a nullable BOOLEAN column
            # degrades to float NaN through pandas, breaking NULL parity
            e = (
                f"CAST(json_extract(rec, '$.{path}') AS BOOLEAN)::VARCHAR"
                if good
                else "CAST(NULL AS VARCHAR)"
            )
            name = f"{name}_str"
        elif cast == "json":
            e = (
                f"json_extract(rec, '$.{path}')::VARCHAR"
                if good
                else "CAST(NULL AS VARCHAR)"
            )
        else:
            e = (
                f"json_extract_string(rec, '$.{path}')"
                if good
                else "CAST(NULL AS VARCHAR)"
            )
        exprs.append(f"{e} AS {name}")
    exprs.append(("NULL" if good else "line") + " AS error_line")
    return exprs


# Shared with the streaming CloudTrail compaction gate (streaming/events.py)
CT_PARSE_ORACLE = f"""
    WITH raw(value) AS (VALUES
      {_values_cte(CT_LINES)}),
    stripped AS (
      SELECT regexp_replace(value, '^\\s+|\\s+$', '', 'g') AS line FROM raw),
    nonblank AS (SELECT line FROM stripped WHERE length(line) > 0),
    flagged AS (
      -- COALESCE: json_type is NULL (not false) when Records is absent
      -- or the line is not JSON, and a NULL ok would drop the line from
      -- BOTH union branches instead of dead-lettering it
      SELECT line, TRY_CAST(line AS JSON) AS j,
             COALESCE(json_type(TRY_CAST(line AS JSON), '$.Records')
                      = 'ARRAY', FALSE) AS ok
      FROM nonblank),
    recs AS (
      SELECT unnest(CAST(j -> '$.Records' AS JSON[])) AS rec
      FROM flagged WHERE ok)
    SELECT {", ".join(_ct_field_exprs(True))} FROM recs
    UNION ALL
    SELECT {", ".join(_ct_field_exprs(False))} FROM flagged WHERE NOT ok
    """


def ct_parity_columns() -> list:
    """Comparable projection of a parsed CloudTrail frame: every typed
    column, the eventTime timestamp as epoch micros, free-form JSON
    sub-documents as their compact text, plus the dead-letter line."""
    cols = []
    for name, _path, cast in CT_FIELDS:
        if cast == "timestamp":
            cols.append(F.unix_micros(F.col(name)).alias(f"{name}_us"))
        elif cast == "bool":
            cols.append(F.col(name).cast("string").alias(f"{name}_str"))
        else:
            cols.append(F.col(name))
    cols.append(F.col("error_line"))
    return cols


@register(
    "q_cloudtrail_parse_fields",
    oracle=CT_PARSE_ORACLE,
    doc="Row-level CloudTrail parse parity: from_json + Records explosion "
    "vs an independent DuckDB JSON re-parse of the same lines — 21 typed "
    "columns incl. nested userIdentity fields and free-form "
    "requestParameters/responseElements captured as compact JSON text; "
    "non-JSON / missing-Records / non-array-Records lines dead-lettered.",
)
def q_cloudtrail_parse_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame([(l,) for l in CT_LINES], "value string")
    return parse_cloudtrail_lines(raw).select(*ct_parity_columns())


@register(
    "q_cloudtrail_agg",
    oracle=f"""
    WITH raw(value) AS (VALUES
      {_values_cte(CT_LINES)}),
    flagged AS (
      SELECT TRY_CAST(value AS JSON) AS j,
             COALESCE(json_type(TRY_CAST(value AS JSON), '$.Records')
                      = 'ARRAY', FALSE) AS ok
      FROM raw),
    recs AS (
      SELECT unnest(CAST(j -> '$.Records' AS JSON[])) AS rec
      FROM flagged WHERE ok)
    SELECT json_extract_string(rec, '$.eventSource') AS event_source,
           COUNT(*) AS n_events,
           COUNT(json_extract(rec, '$.errorCode')) AS n_errors,
           COUNT(DISTINCT json_extract_string(
               rec, '$.requestParameters.bucketName')) AS n_buckets
    FROM recs
    GROUP BY 1
    """,
    doc="CloudTrail analytics over the exploded records: per-service event "
    "and error counts plus a drill-in DISTINCT on a field INSIDE the "
    "free-form requestParameters JSON (get_json_object on the captured "
    "text) — the Athena-style query shape the nested format exists for.",
)
def q_cloudtrail_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = spark.createDataFrame([(l,) for l in CT_LINES], "value string")
    parsed = parse_cloudtrail_lines(raw).where(F.col("error_line").isNull())
    return parsed.groupBy("event_source").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("error_code").alias("n_errors"),
        F.countDistinct(
            F.get_json_object("request_parameters", "$.bucketName")
        ).alias("n_buckets"),
    )


# ---------------------------------------------------------------------------
# Format auto-detection under the oracle
# ---------------------------------------------------------------------------

from ..functions.cloudtrail_parse import CLOUDTRAIL_LINE_PATTERN
from ..functions.s3_log_parse import S3_ACCESS_LOG_PATTERN
from ..sources.generator import generate_log_lines

_MIX_LINES = tuple(
    generate_log_lines(60, seed=11)
    + list(generate_alb_lines(60, seed=12))
    + list(generate_vpc_flow_lines(60, seed=13))
    + list(generate_cloudfront_lines(60, seed=14))
    + list(generate_cloudtrail_lines(60, seed=15, garbage_every=29))
)


@register(
    "q_format_detection",
    oracle=f"""
    WITH raw(value) AS (VALUES
      {_values_cte(_MIX_LINES)})
    SELECT value,
           CASE
             WHEN regexp_matches(value, {_q(CLOUDTRAIL_LINE_PATTERN)})
                  THEN 'cloudtrail'
             WHEN regexp_matches(value, {_q(S3_ACCESS_LOG_PATTERN)}) THEN 's3'
             WHEN regexp_matches(value, {_q(ALB_LOG_PATTERN)}) THEN 'alb'
             WHEN len(string_split(ltrim(value), chr(9))) = 33
                  OR starts_with(ltrim(value), '#') THEN 'cloudfront'
             WHEN len(string_split(trim(value), ' ')) = 14 THEN 'vpcflow'
           END AS detected_format
    FROM raw
    """,
    doc="Per-line format classification under the oracle: the native-"
    "expression classifier (sources/registry.py: classify_lines) vs the "
    "same priority CASE re-expressed in DuckDB over a 300-line corpus "
    "mixing all five formats plus garbage/blank/header lines.",
)
def q_format_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.registry import classify_lines

    raw = spark.createDataFrame([(l,) for l in _MIX_LINES], "value string")
    return classify_lines(raw).select("value", "detected_format")
