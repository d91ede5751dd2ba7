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
