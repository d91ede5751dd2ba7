"""Property-based parser tests (hypothesis).

Two invariants the reference guarantees and the rebuild must keep
(SURVEY.md §1.5, §2.3):

1. **Totality / dead-letter**: for ANY input text, every non-blank line
   produces exactly one output row — either parsed (error_line NULL) or a
   dead-letter row carrying the raw text verbatim; blank lines are dropped.
2. **Field round-trip**: a well-formed line built from arbitrary field
   values parses back to exactly those values, with `-` sentinels mapping
   to NULL and numeric casts applied.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_logs_parquet_converter_spark.functions.s3_log_parse import (
    parse_s3_access_log_lines,
)

# printable, no newlines (a line is the unit of parsing)
line_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=0,
    max_size=200,
)

# tokens legal for \S+ capture groups: printable, no whitespace at all
token = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp"),
        # '"' would end quoted fields early in the surrounding template
        blacklist_characters='"',
    ),
    min_size=1,
    max_size=20,
)

maybe_int = st.one_of(st.none(), st.integers(min_value=0, max_value=10**12))


def _fmt_num(v) -> str:
    return "-" if v is None else str(v)


@settings(max_examples=8, deadline=None)
@given(st.lists(line_text, min_size=0, max_size=60))
def test_parser_totality_and_dead_letter(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = parse_s3_access_log_lines(df).collect()
    # the reference strips each line BEFORE parsing/dead-lettering
    # (s3_server_access_logs.py:135,163) — expectations use stripped lines
    non_blank = [ln.strip() for ln in lines if ln.strip()]
    assert len(rows) == len(non_blank)
    # every unparseable line is preserved (stripped); parsed rows no error
    raw_failed = sorted(r.error_line for r in rows if r.error_line is not None)
    import re

    from aws_logs_parquet_converter_spark.functions.s3_log_parse import (
        S3_ACCESS_LOG_PATTERN,
    )

    expect_failed = sorted(
        ln for ln in non_blank if not re.search(S3_ACCESS_LOG_PATTERN, ln)
    )
    assert raw_failed == expect_failed


@settings(max_examples=8, deadline=None)
@given(
    owner=token,
    bucket=token,
    remote_ip=token,
    key=st.one_of(st.just(None), token),
    status=st.one_of(st.none(), st.integers(min_value=100, max_value=599)),
    nbytes=maybe_int,
    osize=maybe_int,
    total_time=maybe_int,
)
def test_field_round_trip(spark, owner, bucket, remote_ip, key, status, nbytes, osize, total_time):
    line = (
        f"{owner} {bucket} [30/Jul/2024:13:08:44 +0000] {remote_ip} "
        f"arn:aws:iam::1:user/x REQID REST.GET.OBJECT {key or '-'} "
        f'"GET / HTTP/1.1" {_fmt_num(status)} - {_fmt_num(nbytes)} '
        f"{_fmt_num(osize)} {_fmt_num(total_time)} 1 \"-\" \"UA\" - h SigV4 "
        f"c AuthHeader host TLSv1.3 - -"
    )
    df = spark.createDataFrame([(line,)], "value string")
    row = parse_s3_access_log_lines(df).collect()[0]
    assert row.error_line is None, line
    assert row.bucket_owner == owner
    assert row.s3_bucket == bucket
    assert row.remote_ip == remote_ip
    assert row.key == key  # '-' -> NULL
    assert row.http_status == status
    assert row.bytes_sent == nbytes
    assert row.object_size == osize
    assert row.total_time == total_time
    assert row.referrer is None  # '"-"' quoted sentinel
    assert row.user_agent == '"UA"'


# ---------------------------------------------------------------------------
# ALB / VPC-flow / CloudFront parsers: same two invariants
# ---------------------------------------------------------------------------

from aws_logs_parquet_converter_spark.functions.alb_log_parse import (  # noqa: E402
    ALB_LOG_PATTERN,
    parse_alb_log_lines,
)
from aws_logs_parquet_converter_spark.functions.cloudfront_log_parse import (  # noqa: E402
    parse_cloudfront_log_lines,
)
from aws_logs_parquet_converter_spark.functions.vpc_flow_parse import (  # noqa: E402
    parse_vpc_flow_lines,
)


@settings(max_examples=8, deadline=None)
@given(st.lists(line_text, min_size=0, max_size=60))
def test_alb_totality_and_dead_letter(spark, lines):
    import re

    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = parse_alb_log_lines(df).collect()
    non_blank = [ln.strip() for ln in lines if ln.strip()]
    assert len(rows) == len(non_blank)
    raw_failed = sorted(r.error_line for r in rows if r.error_line is not None)
    expect_failed = sorted(
        ln for ln in non_blank if not re.search(ALB_LOG_PATTERN, ln)
    )
    assert raw_failed == expect_failed


@settings(max_examples=8, deadline=None)
@given(st.lists(line_text, min_size=0, max_size=60))
def test_vpcflow_totality_and_dead_letter(spark, lines):
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = parse_vpc_flow_lines(df).collect()
    non_blank = [ln.strip() for ln in lines if ln.strip()]
    assert len(rows) == len(non_blank)
    raw_failed = sorted(r.error_line for r in rows if r.error_line is not None)
    expect_failed = sorted(
        ln for ln in non_blank if len(ln.split(" ")) != 14
    )
    assert raw_failed == expect_failed


@settings(max_examples=8, deadline=None)
@given(st.lists(line_text, min_size=0, max_size=60))
def test_cloudfront_totality_and_dead_letter(spark, lines):
    """CloudFront keeps the RAW line (no strip); drops blank-after-space-trim
    and '#' comment lines (parser semantics: trim/ltrim are space-only)."""
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = parse_cloudfront_log_lines(df).collect()
    kept = [
        ln
        for ln in lines
        if ln.strip(" ") and not ln.lstrip(" ").startswith("#")
    ]
    assert len(rows) == len(kept)
    raw_failed = sorted(r.error_line for r in rows if r.error_line is not None)
    expect_failed = sorted(ln for ln in kept if len(ln.split("\t")) != 33)
    assert raw_failed == expect_failed


@settings(max_examples=8, deadline=None)
@given(
    elb=token,
    client=token,
    elb_status=st.one_of(st.none(), st.integers(min_value=100, max_value=599)),
    received=maybe_int,
    sent=maybe_int,
    req=st.one_of(st.none(), token),
    ua=st.one_of(st.none(), token),
)
def test_alb_field_round_trip(spark, elb, client, elb_status, received, sent, req, ua):
    def q(v):  # quoted-field literal
        return "-" if v is None else f'"{v}"'

    line = (
        f"https 2024-07-30T13:08:44.123456Z {elb} {client} 10.0.0.1:80 "
        f"0.001 0.002 0.003 {_fmt_num(elb_status)} - {_fmt_num(received)} "
        f"{_fmt_num(sent)} {q(req)} {q(ua)} ECDHE-RSA-AES128-GCM-SHA256 "
        f'TLSv1.2 arn:tg "Root=1-abc" "example.com" "arn:cert" 1 '
        f'2024-07-30T13:08:44.100000Z "forward" "-" "-" "10.0.0.1:80" '
        f'"200" "-" "-"'
    )
    df = spark.createDataFrame([(line,)], "value string")
    row = parse_alb_log_lines(df).collect()[0]
    assert row.error_line is None, line
    assert row.request_type == "https"
    assert row.elb == elb
    assert row.client == client
    assert row.elb_status_code == elb_status
    assert row.target_status_code is None  # '-' sentinel
    assert row.received_bytes == received
    assert row.sent_bytes == sent
    # quoted fields come back without quotes; quoted '-' -> NULL
    assert row.request == req
    assert row.user_agent == ua
    assert row.redirect_url is None
    from datetime import datetime

    assert row.time == datetime(2024, 7, 30, 13, 8, 44, 123456)
    assert row.request_creation_time == datetime(2024, 7, 30, 13, 8, 44, 100000)


@settings(max_examples=8, deadline=None)
@given(
    account=st.one_of(st.just(None), token),
    iface=token,
    srcport=st.one_of(st.none(), st.integers(min_value=0, max_value=65535)),
    packets=maybe_int,
    nbytes=maybe_int,
    start=st.integers(min_value=0, max_value=2**31 - 1),
    action=st.sampled_from(["ACCEPT", "REJECT", None]),
)
def test_vpcflow_field_round_trip(spark, account, iface, srcport, packets, nbytes, start, action):
    def s(v):
        return "-" if v is None else str(v)

    line = (
        f"2 {s(account)} {iface} 10.0.0.1 10.0.1.2 {s(srcport)} 443 6 "
        f"{s(packets)} {s(nbytes)} {start} {start + 60} {s(action)} OK"
    )
    df = spark.createDataFrame([(line,)], "value string")
    row = parse_vpc_flow_lines(df).collect()[0]
    assert row.error_line is None, line
    assert row.version == 2
    assert row.account_id == account
    assert row.interface_id == iface
    assert row.srcport == srcport
    assert row.dstport == 443
    assert row.packets == packets
    assert row.bytes == nbytes
    assert row.action == action
    from datetime import datetime, timezone

    expect = datetime.fromtimestamp(start, tz=timezone.utc).replace(tzinfo=None)
    assert row.start_ts == expect
    assert row.end_ts == datetime.fromtimestamp(start + 60, tz=timezone.utc).replace(tzinfo=None)


@settings(max_examples=8, deadline=None)
@given(
    edge=token,
    sc_bytes=maybe_int,
    ip=token,
    status=st.one_of(st.none(), st.integers(min_value=100, max_value=599)),
    time_taken_ms=st.one_of(st.none(), st.integers(min_value=0, max_value=10**6)),
    content_len=maybe_int,
)
def test_cloudfront_field_round_trip(spark, edge, sc_bytes, ip, status, time_taken_ms, content_len):
    def s(v):
        return "-" if v is None else str(v)

    tt = "-" if time_taken_ms is None else f"{time_taken_ms}.0"
    fields = [
        "2024-07-30", "13:08:44", edge, s(sc_bytes), ip, "GET",
        "d1.cloudfront.net", "/index.html", s(status), "-", "Mozilla%2F5.0",
        "q=1", "-", "Hit", "reqid1", "host.example", "https", "512", tt,
        "-", "TLSv1.3", "TLS_AES_128_GCM_SHA256", "Hit", "HTTP%2F2.0", "-",
        "-", "12345", "0.001", "Hit", "text%2Fhtml", s(content_len), "-", "-",
    ]
    assert len(fields) == 33
    df = spark.createDataFrame([("\t".join(fields),)], "value string")
    row = parse_cloudfront_log_lines(df).collect()[0]
    assert row.error_line is None
    assert row.x_edge_location == edge
    assert row.sc_bytes == sc_bytes
    assert row.c_ip == ip
    assert row.sc_status == status
    assert row.cs_referer is None  # '-' sentinel
    assert row.time_taken == (None if time_taken_ms is None else float(time_taken_ms))
    assert row.sc_content_len == content_len
    from datetime import datetime

    assert row.request_ts == datetime(2024, 7, 30, 13, 8, 44)
