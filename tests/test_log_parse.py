"""Parser fidelity tests.

Golden line + expectations from the reference's own test suite
(``converters/s3-server-access-log/test_s3_server_access_logs.py:158-215``,
golden line at ``:190``) and FIXTURES.md §1.
"""

from datetime import datetime

import pytest

from aws_logs_parquet_converter_spark.functions.s3_log_parse import (
    OUTPUT_COLUMNS,
    S3_ACCESS_LOG_SCHEMA,
    parse_s3_access_log_lines,
)
from aws_logs_parquet_converter_spark.sources.generator import (
    generate_log_lines,
    write_log_files,
)
from aws_logs_parquet_converter_spark.sources.logs import read_s3_access_logs

GOLDEN_LINE = (
    "2f72d68abcde93a1d8fd610f6b970dc1cabf1ddc49890eff97a5f24db329007e test-bucket "
    "[30/Jul/2024:13:08:44 +0000] 1.1.1.1 "
    "arn:aws:sts::123456789:assumed-role/TestRole/i-123456789abcdefgh BZCH9YMEC2WD3E4Z "
    'REST.HEAD.BUCKET - "HEAD / HTTP/1.1" 200 - - - 26 26 "-" '
    '"Hadoop 3.3.1, aws-sdk-java/1.12.189 Linux/5.15.0-1064-aws '
    "OpenJDK_64-Bit_Server_VM/25.382-b05 java/1.8.0_382 scala/2.12.14 "
    'vendor/Azul_Systems,_Inc. cfg/retry-mode/legacy" - '
    "ywUV+WX4hdG+LOGtBznXDFARyoT1wwLmHy9FrxRqfz25a86QIizV6v8bYK9/FCDpRYBzknx4/e4= "
    "SigV4 TLS_AES_128_GCM_SHA256 AuthHeader test-bucket.s3.amazonaws.com TLSv1.3 - -"
)


def _parse(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    return parse_s3_access_log_lines(df)


def test_golden_line(spark):
    row = _parse(spark, [GOLDEN_LINE]).collect()[0]
    assert row.error_line is None
    assert row.s3_bucket == "test-bucket"
    assert row.bucket_owner == "2f72d68abcde93a1d8fd610f6b970dc1cabf1ddc49890eff97a5f24db329007e"
    assert row.request_time == datetime(2024, 7, 30, 13, 8, 44)  # zone dropped
    assert row.remote_ip == "1.1.1.1"
    assert row.operation == "REST.HEAD.BUCKET"
    assert row.key is None  # '-' sentinel
    assert row.request == '"HEAD / HTTP/1.1"'  # quotes kept
    assert row.http_status == 200
    assert row.error_code is None
    assert row.bytes_sent is None
    assert row.object_size is None
    assert row.total_time == 26
    assert row.turn_around_time == 26
    assert row.referrer is None  # '"-"' quoted sentinel
    assert row.user_agent is not None and row.user_agent.startswith('"Hadoop 3.3.1')
    assert row.version_id is None
    assert row.signature_version == "SigV4"
    assert row.cipher_suite == "TLS_AES_128_GCM_SHA256"
    assert row.authentication_type == "AuthHeader"
    assert row.host_header == "test-bucket.s3.amazonaws.com"
    assert row.tls_version == "TLSv1.3"
    assert row.access_point_arn is None
    assert row.acl_required is None


def test_schema_matches_contract(spark):
    df = _parse(spark, [GOLDEN_LINE])
    assert df.schema == S3_ACCESS_LOG_SCHEMA
    assert df.columns == OUTPUT_COLUMNS


def test_dead_letter_rows(spark):
    rows = _parse(spark, ["content", "content2"]).collect()
    assert len(rows) == 2
    for row, raw in zip(sorted(rows, key=lambda r: r.error_line), ["content", "content2"]):
        assert row.error_line == raw
        for col in OUTPUT_COLUMNS[:-1]:
            assert row[col] is None, col


def test_blank_lines_dropped(spark):
    rows = _parse(spark, ["", "   ", "\t", GOLDEN_LINE]).collect()
    assert len(rows) == 1
    assert rows[0].error_line is None


def test_invalid_timestamp_is_null_but_line_parses(spark):
    line = GOLDEN_LINE.replace("[30/Jul/2024:13:08:44 +0000]", "[InvalidTimestamp]")
    row = _parse(spark, [line]).collect()[0]
    assert row.error_line is None
    assert row.request_time is None
    assert row.http_status == 200


def test_version_id_single_char_quirk(spark):
    # Reference pattern captures exactly ONE non-space char for version_id
    # (s3_server_access_logs.py:30: `(?P<version>\S)` followed by a literal
    # space). Consequence, replicated here: a single-char version id parses,
    # while a realistic multi-char version id makes the whole line unmatchable
    # -> dead-letter row.
    single = GOLDEN_LINE.replace('" - ywUV', '" X ywUV')
    row = _parse(spark, [single]).collect()[0]
    assert row.error_line is None and row.version_id == "X"

    multi = GOLDEN_LINE.replace('" - ywUV', '" abc123 ywUV')
    row = _parse(spark, [multi]).collect()[0]
    assert row.error_line == multi and row.version_id is None


def test_generator_roundtrip(spark, tmp_path):
    paths = write_log_files(str(tmp_path), n_lines=500, n_files=3, seed=7)
    assert len(paths) == 3
    df = read_s3_access_logs(spark, str(tmp_path) + "/*.txt")
    total = df.count()
    n_blank = sum(1 for ln in generate_log_lines(500, seed=7) if not ln.strip())
    assert total == 500 - n_blank
    bad = df.where("error_line is not null").count()
    good = df.where("error_line is null").count()
    assert bad > 0 and good > 0 and bad + good == total
    # parsed rows carry a timestamp and valid status
    assert df.where("error_line is null and request_time is null").count() == 0
    assert df.where("error_line is null and http_status is null").count() == 0


def test_python_datasource_feeds_parser(spark):
    """Spark 4 Python DataSource: synthetic log lines from a registered
    non-file source, planned one-task-per-partition, parsed by the same
    native-expression parser as file input."""
    from aws_logs_parquet_converter_spark.functions.s3_log_parse import (
        parse_s3_access_log_lines,
    )
    from aws_logs_parquet_converter_spark.sources.generator import (
        SyntheticS3LogDataSource,
    )

    spark.dataSource.register(SyntheticS3LogDataSource)
    raw = (
        spark.read.format("synthetic_s3_logs")
        .option("partitions", "3")
        .option("lines_per_partition", "200")
        .option("seed", "5")
        .load()
    )
    assert raw.rdd.getNumPartitions() == 3
    assert raw.count() == 600
    parsed = parse_s3_access_log_lines(raw)
    n = parsed.count()
    # blank lines are dropped by contract (SURVEY §2.3); everything else rows
    n_blank = raw.where("trim(value) = ''").count()
    assert n == 600 - n_blank
    dead = parsed.where("error_line IS NOT NULL").count()
    assert 0 < dead < n  # generator plants garbage lines; the rest parse
    assert parsed.where("error_line IS NULL AND request_time IS NULL").count() == 0
