"""Native-expression parser for AWS CloudTrail log files (JSON-lines).

The reference repo's README names multi-format log conversion as the goal
(`/root/reference/README.md:11`) but only shipped the space-delimited S3
server-access format; this module adds the NESTED-JSON shape real AWS
users hit next: CloudTrail delivers each log object as one JSON document
``{"Records": [ {...}, {...} ]}`` — the whole document on a single line —
so the same line-oriented sources feed it, but parsing is ``from_json``
+ record explosion instead of a regex.

Engine contract (same as every other registry format):

* **Native expressions only** — one ``from_json`` against the typed
  Records schema, one ``explode``; no Python workers anywhere.
* **Dead letters preserved** — a line that is not valid JSON, or whose
  ``Records`` key is missing or not an array, becomes ONE output row with
  every typed column NULL and the raw line in ``error_line``. A valid
  ``{"Records": []}`` document contributes zero rows (empty, not bad).
* **Free-form sub-documents stay queryable** — ``requestParameters`` /
  ``responseElements`` have no fixed schema across the hundreds of AWS
  APIs, so they are captured as their compact JSON text (Spark's
  ``from_json`` serializes an object field declared ``string`` verbatim);
  downstream queries drill in with ``get_json_object`` / ``from_json``
  per API as needed, exactly Athena's CloudTrail-table design.
* **Explosion keeps the plan shuffle-free** — parse + explode are
  per-partition narrow ops; a 100 TB trail scan stays one
  WholeStageCodegen pass until the user's first aggregate.

At 100 TB scale the one structural difference from the delimited formats
is fan-out: a line yields N record rows (AWS batches up to thousands of
records per delivered object). ``explode`` handles that executor-side
with no repartition; file-count control stays with the compaction sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .chain_cache import session_chain_cache
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: (output column, path inside one Records element, cast) — the single
#: spec table BOTH the Spark parser and the DuckDB oracle are generated
#: from (operators/logformats.py), so semantics cannot drift. Casts:
#: None = string, "bool", "timestamp" (ISO8601, compared as epoch
#: micros), "json" (free-form object captured as compact JSON text).
_FIELDS: list[tuple[str, str, str | None]] = [
    ("event_version", "eventVersion", None),
    ("event_time", "eventTime", "timestamp"),
    ("event_source", "eventSource", None),
    ("event_name", "eventName", None),
    ("aws_region", "awsRegion", None),
    ("source_ip", "sourceIPAddress", None),
    ("user_agent", "userAgent", None),
    ("user_type", "userIdentity.type", None),
    ("user_principal_id", "userIdentity.principalId", None),
    ("user_arn", "userIdentity.arn", None),
    ("user_account_id", "userIdentity.accountId", None),
    ("user_name", "userIdentity.userName", None),
    ("request_parameters", "requestParameters", "json"),
    ("response_elements", "responseElements", "json"),
    ("request_id", "requestID", None),
    ("event_id", "eventID", None),
    ("read_only", "readOnly", "bool"),
    ("event_type", "eventType", None),
    ("recipient_account_id", "recipientAccountId", None),
    ("error_code", "errorCode", None),
    ("error_message", "errorMessage", None),
]

#: Schema of ONE Records element as from_json sees it. eventTime is read
#: as a string and typed afterwards (to_timestamp) so a malformed
#: timestamp NULLs just that column, never the record. The free-form
#: objects are declared StringType on purpose: Spark's JacksonParser
#: re-serializes the object compactly, byte-identical to DuckDB's
#: json_extract (pinned by the q_cloudtrail_parse_fields oracle).
_RECORD_TYPE = StructType(
    [
        StructField("eventVersion", StringType(), True),
        StructField("eventTime", StringType(), True),
        StructField("eventSource", StringType(), True),
        StructField("eventName", StringType(), True),
        StructField("awsRegion", StringType(), True),
        StructField("sourceIPAddress", StringType(), True),
        StructField("userAgent", StringType(), True),
        StructField(
            "userIdentity",
            StructType(
                [
                    StructField("type", StringType(), True),
                    StructField("principalId", StringType(), True),
                    StructField("arn", StringType(), True),
                    StructField("accountId", StringType(), True),
                    StructField("userName", StringType(), True),
                ]
            ),
            True,
        ),
        StructField("requestParameters", StringType(), True),
        StructField("responseElements", StringType(), True),
        StructField("requestID", StringType(), True),
        StructField("eventID", StringType(), True),
        StructField("readOnly", BooleanType(), True),
        StructField("eventType", StringType(), True),
        StructField("recipientAccountId", StringType(), True),
        StructField("errorCode", StringType(), True),
        StructField("errorMessage", StringType(), True),
    ]
)

_DOC_TYPE = StructType([StructField("Records", ArrayType(_RECORD_TYPE), True)])

#: classifier pattern (sources/registry.classify_lines): a CloudTrail
#: line is a JSON document whose first key is "Records" — structurally
#: disjoint from every delimited format before any parse is attempted
CLOUDTRAIL_LINE_PATTERN = r'^\s*\{\s*"Records"\s*:'


def _typed(name: str, cast: str | None):
    if cast == "timestamp":
        return TimestampType()
    if cast == "bool":
        return BooleanType()
    return StringType()


CLOUDTRAIL_LOG_SCHEMA = StructType(
    [StructField(n, _typed(n, c), True) for n, p, c in _FIELDS]
    + [StructField("error_line", StringType(), True)]
)

OUTPUT_COLUMNS = tuple(f.name for f in CLOUDTRAIL_LOG_SCHEMA.fields)


@session_chain_cache
def parse_cloudtrail_lines(value_col: str = "value"):
    """Typed CloudTrail record table from raw JSON lines.

    ONE narrow pass, no union split: ``from_json`` binds the document
    schema; good documents explode their Records array, bad lines ride
    through the same explode as a single NULL element so each yields
    exactly one dead-letter row (``error_line`` = raw line). Blank lines
    are dropped, matching the engine-wide contract. Column tree built
    once per session (chain_cache); public shape stays
    ``parse_cloudtrail_lines(lines, value_col="value")``."""
    v = F.trim(F.col(value_col))
    v_nonempty = F.length(v) > 0
    null_rec = F.array(F.lit(None).cast(_RECORD_TYPE))
    # from_json is the expensive expression here — bind it ONCE in its
    # own projection (Catalyst's CollapseProject keeps non-cheap exprs
    # with multiple downstream references un-inlined, so the parse runs
    # once per line, not once per consumer; verified in the plan)
    line_aliased = v.alias("_line")
    recs = F.from_json(v, _DOC_TYPE)["Records"].alias("_recs")
    # ok <=> the document parsed AND carried a Records array (a non-array
    # Records coerces to NULL under from_json's PERMISSIVE mode, exactly
    # the json_type(j,'$.Records')='ARRAY' test oracle-side)
    ok = F.col("_recs").isNotNull()
    exploded = F.explode(F.when(ok, F.col("_recs")).otherwise(null_rec)).alias("r")
    ok_aliased = ok.alias("_ok")
    cols = []
    for name, path, cast in _FIELDS:
        e = F.col("r").getField(path.split(".")[0])
        for seg in path.split(".")[1:]:
            e = e.getField(seg)
        if cast == "timestamp":
            e = F.to_timestamp(e)
        cols.append(F.when(F.col("_ok"), e).alias(name))
    cols.append(F.when(~F.col("_ok"), F.col("_line")).alias("error_line"))

    def apply(lines: DataFrame) -> DataFrame:
        parsed = lines.where(v_nonempty).select(line_aliased, recs)
        rows = parsed.select("_line", ok_aliased, exploded)
        return rows.select(*cols)

    return apply
