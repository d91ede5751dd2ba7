"""Native-expression parser for AWS ALB (ELBv2) access logs.

The reference repo names ALB logs as a goal it never shipped
(`/root/reference/README.md:11`); this module completes it with the same
engine design as :mod:`.s3_log_parse`: two regex executions per line
(match + group rewrite), one split, sentinel `-` -> NULL, typed casts,
dead-letter rows.

Format (public AWS docs, 29 stable leading fields; trailing additions like
conn_trace_id are tolerated because the pattern is not end-anchored):

    type time elb client:port target:port request_processing_time
    target_processing_time response_processing_time elb_status_code
    target_status_code received_bytes sent_bytes "request" "user_agent"
    ssl_cipher ssl_protocol target_group_arn "trace_id" "domain_name"
    "chosen_cert_arn" matched_rule_priority request_creation_time
    "actions_executed" "redirect_url" "error_reason" "target:port_list"
    "target_status_code_list" "classification" "classification_reason"

Quoted fields are stored WITHOUT their surrounding quotes (unlike the S3
parser's `request`, which keeps them to replicate a reference quirk —
here there is no reference behavior to preserve, so we store clean values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chain_cache import session_chain_cache
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_U = r"(\S+)"  # unquoted field
_Q = r'("[^"]*"|-)'  # quoted field (or bare '-')

# (name, quoted?, cast | None)
_FIELDS: list[tuple[str, bool, str | None]] = [
    ("request_type", False, None),
    ("time", False, "timestamp"),
    ("elb", False, None),
    ("client", False, None),
    ("target", False, None),
    ("request_processing_time", False, "double"),
    ("target_processing_time", False, "double"),
    ("response_processing_time", False, "double"),
    ("elb_status_code", False, "int"),
    ("target_status_code", False, "int"),
    ("received_bytes", False, "bigint"),
    ("sent_bytes", False, "bigint"),
    ("request", True, None),
    ("user_agent", True, None),
    ("ssl_cipher", False, None),
    ("ssl_protocol", False, None),
    ("target_group_arn", False, None),
    ("trace_id", True, None),
    ("domain_name", True, None),
    ("chosen_cert_arn", True, None),
    ("matched_rule_priority", False, "int"),
    ("request_creation_time", False, "timestamp"),
    ("actions_executed", True, None),
    ("redirect_url", True, None),
    ("error_reason", True, None),
    ("target_port_list", True, None),
    ("target_status_code_list", True, None),
    ("classification", True, None),
    ("classification_reason", True, None),
]

ALB_LOG_PATTERN = " ".join(_Q if quoted else _U for _, quoted, _c in _FIELDS)

_SEP = "\x01"
_REPLACEMENT = _SEP.join(f"${i}" for i in range(1, len(_FIELDS) + 1))


def _spark_type(cast: str | None):
    return {
        None: StringType(),
        "int": IntegerType(),
        "bigint": LongType(),
        "double": DoubleType(),
        "timestamp": TimestampType(),
    }[cast]


ALB_LOG_SCHEMA = StructType(
    [StructField(name, _spark_type(cast), True) for name, _q, cast in _FIELDS]
    + [StructField("error_line", StringType(), True)]
)

ALB_LOG_COLUMNS = [f.name for f in ALB_LOG_SCHEMA.fields]


@session_chain_cache
def parse_alb_log_lines(value_col: str = "value"):
    """Raw ALB access-log lines -> typed 30-column table (29 + error_line).

    Column tree built once per session (chain_cache); public shape stays
    ``parse_alb_log_lines(lines, value_col="value")``."""
    line = F.regexp_replace(F.col(value_col), r"(?U)^\s+|\s+$", "")
    line_nonempty = F.length(line) > 0
    line_aliased = line.alias("_line")
    matched = F.regexp_extract(F.col("_line"), ALB_LOG_PATTERN, 0)
    tok = F.when(
        F.col("_matched") != "",
        F.split(
            # _matched is exactly the matched prefix, so full anchoring is
            # correct here (trailing additions never reach this rewrite)
            F.regexp_replace(
                F.col("_matched"), "^" + ALB_LOG_PATTERN + "$", _REPLACEMENT
            ),
            _SEP,
        ),
    )
    ok = F.col("_tok").isNotNull()

    cols: list[Column] = []
    for i, (name, quoted, cast) in enumerate(_FIELDS):
        c: Column = F.element_at(F.col("_tok"), i + 1)
        if quoted:
            c = F.btrim(c, F.lit('"'))
        c = F.nullif(c, F.lit("-"))
        if cast == "timestamp":
            c = c.try_cast("timestamp")  # ISO8601 w/ Z -> UTC session time
        elif cast is not None:
            c = c.try_cast(cast)
        cols.append(F.when(ok, c).alias(name))
    cols.append(F.when(~ok, F.col("_line")).alias("error_line"))

    def apply(lines: DataFrame) -> DataFrame:
        df = lines.where(line_nonempty).select(line_aliased)
        df = df.withColumn("_matched", matched).withColumn("_tok", tok)
        return df.select(*cols)

    return apply
