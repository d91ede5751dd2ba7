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
