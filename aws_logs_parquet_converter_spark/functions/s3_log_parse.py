"""Native-expression parser for the AWS S3 server-access-log format.

Re-expresses the reference's per-row Python parser
(``converters/s3-server-access-log/s3_server_access_logs.py:157-228`` — regex at
``:25-34``, timestamp at ``:144-154``, schema at ``:231-261``) as Catalyst
expressions so the whole parse runs inside Tungsten whole-stage codegen on the
JVM — no Python workers, no RDDs.

Design: instead of 26 separate ``regexp_extract`` calls (26 regex executions
per line), we run the regex **twice** per line:

1. ``regexp_extract(line, PATTERN, 0)`` pulls the matched substring
   (search semantics, identical to the reference's ``re.search``); empty
   string means no match -> dead-letter row.
2. ``regexp_replace(matched, '^PATTERN$', '$1\\x01$2...$26')`` rewrites the
   match into a ``\\x01``-joined field list, which one cheap ``split`` turns
   into an array; each field is then ``element_at`` + sentinel/cast logic.

Reference semantics preserved exactly (SURVEY.md §2.3 correctness traps):

* ``-`` is the missing sentinel for most fields; quoted fields
  (``referrer``/``user_agent``) use ``"-"`` *with* quotes.
* ``request`` keeps its surrounding double quotes.
* ``version_id`` captures exactly ONE non-space char (the reference pattern
  uses ``(?P<version>\\S)`` without ``+`` — a documented quirk we replicate).
* The timestamp drops its timezone: content of ``[...]`` up to the first
  space, parsed as ``dd/MMM/yyyy:HH:mm:ss`` -> naive timestamp, second
  precision, TIMESTAMP_MILLIS physical type on write.
* Unparseable lines are dead-lettered (26 NULLs + raw text in
  ``error_line``), parsed lines carry ``error_line = NULL``.
* Blank / whitespace-only lines produce no row.

Divergence (strictly more robust, documented): a *matched* line whose
timestamp or numeric field is garbage yields NULL in that field; the
reference's Python parser would raise and kill the job
(``int(...)`` at ``:204-211``, ``.isoformat()`` on ``None`` at ``:197``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .chain_cache import session_chain_cache
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Our own expression of the public AWS S3 server-access-log grammar
# (https://docs.aws.amazon.com/AmazonS3/latest/userguide/LogFormat.html),
# field-for-field compatible with the reference's pattern, numbered groups:
#  1 owner  2 bucket  3 time[]  4 ip  5 requester  6 request_id  7 operation
#  8 key  9 request  10 status  11 error_code  12 bytes  13 size
# 14 total_time  15 turn_around  16 referrer  17 user_agent  18 version(1ch!)
# 19 host_id  20 sig_version  21 cipher  22 auth_type  23 host_header
# 24 tls  25 access_point_arn  26 acl_required
S3_ACCESS_LOG_PATTERN = (
    r"(\S+) (\S+) (\[[^\]]*\]) (\S+) (\S+) (\S+) (\S+) (\S+) "
    r'("[^"]*"|-) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) ("[^"]*"|-) '
    r'("[^"]*"|-) (\S) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+) (\S+)'
)

_N_GROUPS = 26
_SEP = "\x01"
_REPLACEMENT = _SEP.join(f"${i}" for i in range(1, _N_GROUPS + 1))

# (name, 1-based regex group, sentinel literal or None, cast type or None)
_FIELD_SPECS: list[tuple[str, int, str | None, str | None]] = [
    ("bucket_owner", 1, None, None),
    ("s3_bucket", 2, None, None),
    # group 3 (time) handled separately -> request_time
    ("remote_ip", 4, None, None),
    ("requester", 5, None, None),
    ("request_id", 6, None, None),
    ("operation", 7, None, None),
    ("key", 8, "-", None),
    ("request", 9, None, None),  # keeps quotes (reference :203)
    ("http_status", 10, "-", "int"),
    ("error_code", 11, "-", None),
    ("bytes_sent", 12, "-", "bigint"),
    ("object_size", 13, "-", "bigint"),
    ("total_time", 14, "-", "bigint"),
    ("turn_around_time", 15, "-", "bigint"),
    ("referrer", 16, '"-"', None),  # quoted sentinel (reference :212)
    ("user_agent", 17, '"-"', None),  # quoted sentinel (reference :213)
    ("version_id", 18, "-", None),  # 1-char capture quirk (reference :30)
    ("host_id", 19, "-", None),
    ("signature_version", 20, "-", None),
    ("cipher_suite", 21, "-", None),
    ("authentication_type", 22, "-", None),
    ("host_header", 23, "-", None),
    ("tls_version", 24, "-", None),
    ("access_point_arn", 25, "-", None),
    ("acl_required", 26, "-", None),
]

# Parsed table schema: reference output schema (s3_server_access_logs.py:231-261)
# with the derived timestamp in place of request_time_string (:405-441).
S3_ACCESS_LOG_SCHEMA = StructType(
    [
        StructField("bucket_owner", StringType(), True),
        StructField("s3_bucket", StringType(), True),
        StructField("request_time", TimestampType(), True),
        StructField("remote_ip", StringType(), True),
        StructField("requester", StringType(), True),
        StructField("request_id", StringType(), True),
        StructField("operation", StringType(), True),
        StructField("key", StringType(), True),
        StructField("request", StringType(), True),
        StructField("http_status", IntegerType(), True),
        StructField("error_code", StringType(), True),
        StructField("bytes_sent", LongType(), True),
        StructField("object_size", LongType(), True),
        StructField("total_time", LongType(), True),
        StructField("turn_around_time", LongType(), True),
        StructField("referrer", StringType(), True),
        StructField("user_agent", StringType(), True),
        StructField("version_id", StringType(), True),
        StructField("host_id", StringType(), True),
        StructField("signature_version", StringType(), True),
        StructField("cipher_suite", StringType(), True),
        StructField("authentication_type", StringType(), True),
        StructField("host_header", StringType(), True),
        StructField("tls_version", StringType(), True),
        StructField("access_point_arn", StringType(), True),
        StructField("acl_required", StringType(), True),
        StructField("error_line", StringType(), True),
    ]
)

OUTPUT_COLUMNS = [f.name for f in S3_ACCESS_LOG_SCHEMA.fields]


def _parse_time(time_group: Column) -> Column:
    """``[30/Jul/2024:13:08:44 +0000]`` -> naive timestamp (zone dropped).

    Replicates the reference's slice-to-first-space + dateutil parse
    (s3_server_access_logs.py:144-154): take the bracket content up to the
    first space or closing bracket, parse as dd/MMM/yyyy:HH:mm:ss; anything
    malformed -> NULL.
    """
    body = F.regexp_extract(time_group, r"\[([^\s\]]+)", 1)
    return F.try_to_timestamp(body, F.lit("dd/MMM/yyyy:HH:mm:ss"))


@session_chain_cache
def parse_s3_access_log_lines(value_col: str = "value"):
    """Parse a DataFrame of raw log lines into the 27-column typed table.

    Input: one string column (default ``value``, as produced by
    ``spark.read.text``). Output: ``S3_ACCESS_LOG_SCHEMA`` — entirely native
    expressions, single stage, no shuffle. Public shape stays
    ``parse_s3_access_log_lines(lines, value_col="value")``; the Column
    tree is built once per session (chain_cache) so per-micro-batch
    streaming calls don't rebuild ~150 py4j expressions each trigger.
    """
    # Python str.strip() semantics (reference :135): strip ALL whitespace
    # (unicode-aware — (?U) makes Java's \s match e.g.   like Python's
    # str.strip does), drop empty; F.trim only handles spaces.
    line = F.regexp_replace(F.col(value_col), r"(?U)^\s+|\s+$", "")
    line_nonempty = F.length(line) > 0
    line_aliased = line.alias("_line")

    # Regex exec #1: matched substring (search semantics; '' = no match).
    matched = F.regexp_extract(F.col("_line"), S3_ACCESS_LOG_PATTERN, 0)
    # Regex exec #2: rewrite the matched text into \x01-joined groups, split once.
    tok = F.when(
        F.col("_matched") != "",
        F.split(
            F.regexp_replace(
                F.col("_matched"), "^" + S3_ACCESS_LOG_PATTERN + "$", _REPLACEMENT
            ),
            _SEP,
        ),
    )

    ok = F.col("_tok").isNotNull()

    def _tok(i: int) -> Column:
        return F.element_at(F.col("_tok"), i)

    cols: list[Column] = []
    for name in OUTPUT_COLUMNS:
        if name == "request_time":
            cols.append(F.when(ok, _parse_time(_tok(3))).alias(name))
        elif name == "error_line":
            cols.append(F.when(~ok, F.col("_line")).alias(name))
        else:
            fname, grp, sentinel, cast = next(s for s in _FIELD_SPECS if s[0] == name)
            c = _tok(grp)
            if sentinel is not None:
                c = F.nullif(c, F.lit(sentinel))
            if cast is not None:
                c = c.try_cast(cast)
            cols.append(F.when(ok, c).alias(name))

    def apply(lines: DataFrame) -> DataFrame:
        df = lines.where(line_nonempty).select(line_aliased)
        df = df.withColumn("_matched", matched).withColumn("_tok", tok)
        return df.select(*cols)

    return apply
