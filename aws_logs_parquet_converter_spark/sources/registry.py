"""Log-format registry: one reader entry point for every supported format.

SURVEY.md §4.3 identifies this as the one "custom" piece the engine needs:
a registry of (schema, parse-expression builder) per log format, so adding
a format never touches the engine — exactly the extension path the
reference's README promises (VPC / S3 / ALB, `/root/reference/README.md:11`)
but only delivered for S3.

Every parser follows the same contract: native expressions only, fixed
StructType schema, `-` sentinel -> NULL, unparseable lines dead-lettered
into `error_line`, blank lines dropped.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..functions.alb_log_parse import ALB_LOG_SCHEMA, parse_alb_log_lines
from ..functions.cloudfront_log_parse import (
    CLOUDFRONT_LOG_SCHEMA,
    parse_cloudfront_log_lines,
)
from ..functions.s3_log_parse import S3_ACCESS_LOG_SCHEMA, parse_s3_access_log_lines
from ..functions.vpc_flow_parse import VPC_FLOW_SCHEMA, parse_vpc_flow_lines
from .logs import read_text_lines


@dataclass(frozen=True)
class LogFormat:
    name: str
    schema: StructType
    parse: Callable[[DataFrame], DataFrame]


FORMATS: dict[str, LogFormat] = {
    "s3": LogFormat("s3", S3_ACCESS_LOG_SCHEMA, parse_s3_access_log_lines),
    "alb": LogFormat("alb", ALB_LOG_SCHEMA, parse_alb_log_lines),
    "vpcflow": LogFormat("vpcflow", VPC_FLOW_SCHEMA, parse_vpc_flow_lines),
    "cloudfront": LogFormat(
        "cloudfront", CLOUDFRONT_LOG_SCHEMA, parse_cloudfront_log_lines
    ),
}


def read_logs(
    spark: SparkSession, paths: str | Sequence[str], fmt: str = "s3"
) -> DataFrame:
    """Read raw log files of the given format into its typed table."""
    if fmt not in FORMATS:
        raise KeyError(f"unknown log format {fmt!r}; supported: {sorted(FORMATS)}")
    return FORMATS[fmt].parse(read_text_lines(spark, paths))


# ---------------------------------------------------------------------------
# Normalized HTTP-event view across formats
# ---------------------------------------------------------------------------

HTTP_EVENT_COLUMNS = (
    "source_format",
    "event_time",
    "client_ip",
    "http_method",
    "path",
    "status",
    "bytes_sent",
    "user_agent",
    "error_line",
)


def _normalize_http(fmt: str, df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    if fmt == "s3":
        # request is quoted: "GET /key HTTP/1.1" (quotes preserved, SURVEY §2.3)
        req = F.regexp_replace(F.col("request"), '^"|"$', "")
        out = df.select(
            F.lit("s3").alias("source_format"),
            F.col("request_time").alias("event_time"),
            F.col("remote_ip").alias("client_ip"),
            F.split(req, " ").getItem(0).alias("http_method"),
            F.split(req, " ").getItem(1).alias("path"),
            F.col("http_status").alias("status"),
            F.col("bytes_sent"),
            F.col("user_agent"),
            F.col("error_line"),
        )
    elif fmt == "alb":
        req = F.regexp_replace(F.col("request"), '^"|"$', "")
        url = F.split(req, " ").getItem(1)
        out = df.select(
            F.lit("alb").alias("source_format"),
            F.col("time").alias("event_time"),
            F.split(F.col("client"), ":").getItem(0).alias("client_ip"),
            F.split(req, " ").getItem(0).alias("http_method"),
            # strip scheme://host:port -> /path?query
            F.regexp_replace(url, r"^[a-z]+://[^/]+", "").alias("path"),
            F.col("elb_status_code").alias("status"),
            F.col("sent_bytes").alias("bytes_sent"),
            F.col("user_agent"),
            F.col("error_line"),
        )
    elif fmt == "cloudfront":
        out = df.select(
            F.lit("cloudfront").alias("source_format"),
            F.col("request_ts").alias("event_time"),
            F.col("c_ip").alias("client_ip"),
            F.col("cs_method").alias("http_method"),
            F.col("cs_uri_stem").alias("path"),
            F.col("sc_status").alias("status"),
            F.col("sc_bytes").alias("bytes_sent"),
            F.col("cs_user_agent").alias("user_agent"),
            F.col("error_line"),
        )
    else:
        raise KeyError(f"format {fmt!r} has no HTTP normalization (vpcflow is L3/L4)")
    from pyspark.sql import functions as F2

    # '-' sentinel -> NULL for the derived request fields (ALB emits
    # literal "- - -" requests for failed connections), matching the
    # engine-wide NULL contract (SURVEY §1.4)
    return out.select(
        "source_format",
        F.col("event_time").cast("timestamp").alias("event_time"),
        F2.nullif(F.col("client_ip"), F.lit("-")).alias("client_ip"),
        F2.nullif(F.col("http_method"), F.lit("-")).alias("http_method"),
        F2.nullif(F.col("path"), F.lit("-")).alias("path"),
        F2.col("status").cast("int").alias("status"),
        F2.col("bytes_sent").cast("bigint").alias("bytes_sent"),
        "user_agent",
        "error_line",
    )


def read_http_events(spark: SparkSession, sources: dict[str, str]) -> DataFrame:
    """One uniform request table over heterogeneous log formats: parse each
    format with its registry entry, normalize to HTTP_EVENT_COLUMNS, union.

    The cross-format analytics surface the reference leaves to per-table
    Athena DDL: a single ``WHERE status >= 500 GROUP BY source_format``
    works across S3 / ALB / CloudFront logs. Normalization is per-row
    native expressions on top of the (already Exchange-free) parsers, so
    the union stays a scan-concat: zero shuffles until the user's first
    aggregate. Dead letters survive normalization (error_line rides
    along), so audits work on the union too."""
    parts = [
        _normalize_http(fmt, read_logs(spark, path, fmt))
        for fmt, path in sorted(sources.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
