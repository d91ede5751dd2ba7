"""Deterministic synthetic S3 server-access-log generator (test/bench fixture).

Produces raw text lines in the public AWS log format (FIXTURES.md §1/§4):
well-formed lines with varied sentinel placement, garbage lines, and blanks.
Seeded ``random.Random`` -> reproducible across runs.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

_OPERATIONS = [
    "REST.GET.OBJECT",
    "REST.PUT.OBJECT",
    "REST.HEAD.BUCKET",
    "REST.GET.BUCKET",
    "REST.DELETE.OBJECT",
    "BATCH.DELETE.OBJECT",
]
_STATUSES = [200, 200, 200, 204, 206, 301, 304, 403, 404, 500, 503]
_ERROR_CODES = {403: "AccessDenied", 404: "NoSuchKey", 500: "InternalError", 503: "SlowDown"}
_AGENTS = [
    '"aws-sdk-java/1.12.189 Linux/5.15 OpenJDK_64-Bit"',
    '"aws-cli/2.15.0 Python/3.11.6 Linux/6.1"',
    '"Boto3/1.34.0 md/Botocore"',
    '"-"',
]
_TLS = ["TLSv1.2", "TLSv1.3", "-"]


def generate_log_lines(
    n: int,
    seed: int = 42,
    bucket: str = "synth-bucket",
    start: datetime | None = None,
    garbage_every: int = 97,
    blank_every: int = 101,
) -> list[str]:
    """n log lines, deterministically seeded; ~1% garbage, ~1% blanks."""
    rng = random.Random(seed)
    start = start or datetime(2024, 7, 1, 0, 0, 0)
    lines: list[str] = []
    for i in range(n):
        if blank_every and i % blank_every == blank_every - 1:
            lines.append("   " if rng.random() < 0.5 else "")
            continue
        if garbage_every and i % garbage_every == garbage_every - 1:
            lines.append(f"garbage line {i} not a log")
            continue
        ts = start + timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
        status = rng.choice(_STATUSES)
        err = _ERROR_CODES.get(status, "-")
        op = rng.choice(_OPERATIONS)
        key = f"data/part-{rng.randint(0, 9999):05d}.parquet" if rng.random() > 0.1 else "-"
        nbytes = rng.randint(100, 10_000_000) if status < 300 and rng.random() > 0.2 else "-"
        osize = rng.randint(100, 10_000_000) if nbytes != "-" else "-"
        total_ms = rng.randint(1, 5000)
        turn_ms = max(1, total_ms - rng.randint(0, total_ms - 1)) if rng.random() > 0.1 else "-"
        req = f'"GET /{bucket}/{key} HTTP/1.1"' if key != "-" else "-"
        referrer = '"https://console.aws.amazon.com"' if rng.random() < 0.2 else '"-"'
        owner = f"{rng.getrandbits(128):032x}"
        reqid = f"{rng.getrandbits(64):016X}"
        remote_ip = f"10.{rng.randint(0, 255)}.{rng.randint(0, 255)}.{rng.randint(1, 254)}"
        requester = (
            f"arn:aws:iam::123456789012:user/user{rng.randint(0, 50)}"
            if rng.random() > 0.15
            else "-"
        )
        tstr = ts.strftime("%d/%b/%Y:%H:%M:%S +0000")
        agent = rng.choice(_AGENTS)
        tls = rng.choice(_TLS)
        host_id = f"{rng.getrandbits(160):040x}="
        sig = rng.choice(["SigV4", "SigV2", "-"])
        cipher = "TLS_AES_128_GCM_SHA256" if tls != "-" else "-"
        auth = "AuthHeader" if requester != "-" else "-"
        lines.append(
            f"{owner} {bucket} [{tstr}] {remote_ip} {requester} {reqid} {op} {key} "
            f"{req} {status} {err} {nbytes} {osize} {total_ms} {turn_ms} {referrer} "
            f"{agent} - {host_id} {sig} {cipher} {auth} {bucket}.s3.amazonaws.com {tls} - -"
        )
    return lines


def write_log_files(
    out_dir: str, n_lines: int, n_files: int = 4, seed: int = 42, **kwargs
) -> list[str]:
    """Write n_lines across n_files text files; returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    lines = generate_log_lines(n_lines, seed=seed, **kwargs)
    per = max(1, (len(lines) + n_files - 1) // n_files)
    paths = []
    for f in range(n_files):
        chunk = lines[f * per : (f + 1) * per]
        if not chunk:
            break
        p = os.path.join(out_dir, f"access_log_{f:04d}.txt")
        with open(p, "w", encoding="utf-8") as fh:
            fh.write("\n".join(chunk) + "\n")
        paths.append(p)
    return paths


# ---------------------------------------------------------------------------
# ALB / VPC-flow synthetic lines (same conventions: seeded, ~1% garbage)
# ---------------------------------------------------------------------------

GOLDEN_ALB_LINE = (
    'https 2024-07-02T22:23:00.186641Z app/my-lb/50dc6c495c0c9188 '
    '192.168.131.39:2817 10.0.0.1:80 0.000086 0.001048 0.001337 200 200 34 366 '
    '"GET https://www.example.com:443/ HTTP/1.1" "curl/7.46.0" '
    'ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 '
    'arn:aws:elasticloadbalancing:us-east-2:123456789012:targetgroup/my-targets/73e2d6bc24d8a067 '
    '"Root=1-58337281-1d84f3d73c47ec4e58577259" "www.example.com" '
    '"arn:aws:acm:us-east-2:123456789012:certificate/12345678-1234-1234-1234-123456789012" '
    '0 2024-07-02T22:22:48.364000Z "forward" "-" "-" "10.0.0.1:80" "200" "-" "-"'
)

GOLDEN_VPC_FLOW_LINE = (
    "2 123456789010 eni-1235b8ca123456789 172.31.16.139 172.31.16.21 "
    "20641 22 6 20 4249 1418530010 1418530070 ACCEPT OK"
)


def generate_alb_lines(n: int, seed: int = 42, garbage_every: int = 97) -> list[str]:
    rng = random.Random(seed)
    start = datetime(2024, 7, 1, 0, 0, 0)
    lines = []
    for i in range(n):
        if garbage_every and i % garbage_every == garbage_every - 1:
            lines.append(f"not an alb line {i}")
            continue
        ts = start + timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
        t = ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        status = rng.choice([200, 200, 200, 301, 404, 502])
        tstatus = "-" if status == 502 else str(status)
        ttime = "-1" if status == 502 else f"{rng.random() / 100:.6f}"
        lines.append(
            f"https {t} app/bench-lb/{rng.getrandbits(32):08x} "
            f"10.0.{rng.randint(0, 255)}.{rng.randint(1, 254)}:{rng.randint(1024, 65535)} "
            f"10.1.0.{rng.randint(1, 254)}:443 {rng.random() / 1000:.6f} {ttime} "
            f"{rng.random() / 1000:.6f} {status} {tstatus} {rng.randint(30, 900)} "
            f'{rng.randint(200, 100000)} "GET https://svc.example.com:443/p/{rng.randint(0, 999)} HTTP/1.1" '
            f'"agent/{rng.randint(1, 9)}.0" ECDHE-RSA-AES128-GCM-SHA256 TLSv1.2 '
            f"arn:aws:elasticloadbalancing:us-east-1:1:targetgroup/tg/{rng.getrandbits(32):08x} "
            f'"Root=1-{rng.getrandbits(32):08x}" "svc.example.com" "-" 0 {t} '
            f'"forward" "-" "-" "10.1.0.1:443" "{tstatus}" "-" "-"'
        )
    return lines


def generate_vpc_flow_lines(n: int, seed: int = 42, garbage_every: int = 97) -> list[str]:
    rng = random.Random(seed)
    base = 1720000000
    lines = []
    for i in range(n):
        if garbage_every and i % garbage_every == garbage_every - 1:
            lines.append(f"garbage {i}")
            continue
        if rng.random() < 0.02:  # NODATA record: sentinel-heavy
            lines.append(
                f"2 123456789010 eni-{rng.getrandbits(32):08x} - - - - - - - "
                f"{base + i} {base + i + 60} - NODATA"
            )
            continue
        start = base + rng.randint(0, 30 * 24 * 3600)
        lines.append(
            f"2 123456789010 eni-{rng.getrandbits(32):08x} "
            f"172.31.{rng.randint(0, 255)}.{rng.randint(1, 254)} "
            f"172.31.{rng.randint(0, 255)}.{rng.randint(1, 254)} "
            f"{rng.randint(1024, 65535)} {rng.choice([22, 80, 443, 5432])} "
            f"{rng.choice([6, 6, 6, 17])} {rng.randint(1, 500)} "
            f"{rng.randint(40, 1_000_000)} {start} {start + 60} "
            f"{rng.choice(['ACCEPT', 'ACCEPT', 'ACCEPT', 'REJECT'])} OK"
        )
    return lines


GOLDEN_CLOUDFRONT_LINE = (
    "2019-12-04\t21:02:31\tLAX1\t392\t192.0.2.100\tGET\td111111abcdef8.cloudfront.net"
    "\t/index.html\t200\t-\tMozilla/5.0%20(Windows%20NT%2010.0)\t-\t-\tHit"
    "\tSOX4xwn4XV6Q4rgb7XiVGOHms_BGlTAC4KyHmureZmBNrjGdRLiNIQ=="
    "\td111111abcdef8.cloudfront.net\thttps\t23\t0.001\t-\tTLSv1.2"
    "\tECDHE-RSA-AES128-GCM-SHA256\tHit\tHTTP/2.0\t-\t-\t11040\t0.001\tHit"
    "\ttext/html\t78\t-\t-"
)

CLOUDFRONT_FIELDS_HEADER = (
    "#Fields: date time x-edge-location sc-bytes c-ip cs-method cs(Host) "
    "cs-uri-stem sc-status cs(Referer) cs(User-Agent) cs-uri-query cs(Cookie) "
    "x-edge-result-type x-edge-request-id x-host-header cs-protocol cs-bytes "
    "time-taken x-forwarded-for ssl-protocol ssl-cipher "
    "x-edge-response-result-type cs-protocol-version fle-status "
    "fle-encrypted-fields c-port time-to-first-byte "
    "x-edge-detailed-result-type sc-content-type sc-content-len "
    "sc-range-start sc-range-end"
)


def generate_cloudfront_lines(n: int, seed: int = 42, garbage_every: int = 97) -> list[str]:
    """CloudFront standard-log lines incl. the two `#` header lines."""
    rng = random.Random(seed)
    start = datetime(2024, 7, 1, 0, 0, 0)
    lines = ["#Version: 1.0", CLOUDFRONT_FIELDS_HEADER]
    edges = ["LAX1", "IAD79", "FRA56", "NRT12", "SYD4"]
    results = ["Hit", "Hit", "Hit", "Miss", "RefreshHit", "Error"]
    for i in range(n):
        if garbage_every and i % garbage_every == garbage_every - 1:
            lines.append(f"not a cloudfront line {i}")
            continue
        ts = start + timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
        status = rng.choice([200, 200, 200, 200, 304, 404, 502])
        res = "Error" if status >= 500 else rng.choice(results)
        ssl = rng.choice(["TLSv1.2", "TLSv1.3"])
        lines.append(
            "\t".join(
                [
                    ts.strftime("%Y-%m-%d"),
                    ts.strftime("%H:%M:%S"),
                    rng.choice(edges),
                    str(rng.randint(200, 100000)),
                    f"192.0.2.{rng.randint(1, 254)}",
                    rng.choice(["GET", "GET", "GET", "HEAD", "POST"]),
                    "d111111abcdef8.cloudfront.net",
                    f"/asset/{rng.randint(0, 999)}.js",
                    str(status),
                    "-",
                    f"agent/{rng.randint(1, 9)}.0",
                    "-" if rng.random() < 0.7 else f"v={rng.randint(1, 99)}",
                    "-",
                    res,
                    f"{rng.getrandbits(64):016x}==",
                    "www.example.com",
                    "https",
                    str(rng.randint(20, 2000)),
                    f"{rng.random() / 10:.3f}",
                    "-",
                    ssl,
                    "ECDHE-RSA-AES128-GCM-SHA256",
                    res,
                    rng.choice(["HTTP/2.0", "HTTP/1.1"]),
                    "-",
                    "-",
                    str(rng.randint(1024, 65535)),
                    f"{rng.random() / 20:.3f}",
                    res,
                    "-" if status == 304 else "text/javascript",
                    "-" if status == 304 else str(rng.randint(200, 100000)),
                    "-",
                    "-",
                ]
            )
        )
    return lines


def generate_cloudtrail_lines(
    n: int, seed: int = 42, garbage_every: int = 97
) -> list[str]:
    """CloudTrail-style JSON lines: each line one delivered log document
    ``{"Records": [...]}`` holding 1-5 records (compact JSON, stable key
    order — the parser's re-serialization of the free-form sub-objects
    must round-trip byte-identically). Garbage lines rotate through the
    three dead-letter shapes: non-JSON text, JSON without a Records
    array, and a Records that is not an array."""
    import json

    rng = random.Random(seed)
    start = datetime(2024, 7, 1, 0, 0, 0)
    apis = [
        ("s3.amazonaws.com", "GetObject", True),
        ("s3.amazonaws.com", "PutObject", False),
        ("s3.amazonaws.com", "ListBuckets", True),
        ("ec2.amazonaws.com", "DescribeInstances", True),
        ("ec2.amazonaws.com", "RunInstances", False),
        ("sts.amazonaws.com", "AssumeRole", True),
        ("iam.amazonaws.com", "CreateUser", False),
    ]
    regions = ["us-east-1", "us-west-2", "eu-west-1", "ap-northeast-1"]
    accounts = ["111122223333", "444455556666", "777788889999"]
    bad_shapes = [
        lambda i: f"not a cloudtrail line {i}",
        lambda i: json.dumps({"NotRecords": i}, separators=(",", ":")),
        lambda i: json.dumps({"Records": f"oops{i}"}, separators=(",", ":")),
    ]
    lines: list[str] = []
    for i in range(n):
        if garbage_every and i % garbage_every == garbage_every - 1:
            lines.append(bad_shapes[(i // garbage_every) % len(bad_shapes)](i))
            continue
        records = []
        for _ in range(rng.randint(1, 5)):
            src, name, ro = rng.choice(apis)
            acct = rng.choice(accounts)
            ts = start + timedelta(seconds=rng.randint(0, 30 * 24 * 3600))
            user = rng.choice(["alice", "bob", "carol", None])
            ident: dict = {"type": "IAMUser" if user else "AWSService"}
            if user:
                ident.update(
                    {
                        "principalId": f"AIDA{rng.getrandbits(32):08X}",
                        "arn": f"arn:aws:iam::{acct}:user/{user}",
                        "accountId": acct,
                        "userName": user,
                    }
                )
            rec: dict = {
                "eventVersion": "1.08",
                "eventTime": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                "eventSource": src,
                "eventName": name,
                "awsRegion": rng.choice(regions),
                "sourceIPAddress": f"192.0.2.{rng.randint(1, 254)}",
                "userIdentity": ident,
                "requestID": f"{rng.getrandbits(64):016X}",
                "eventID": f"evt-{rng.getrandbits(48):012x}",
                "readOnly": ro,
                "eventType": "AwsApiCall",
                "recipientAccountId": acct,
            }
            if rng.random() < 0.8:
                rec["userAgent"] = rng.choice(
                    ["aws-cli/2.15.0", "Boto3/1.34.0", "console.amazonaws.com"]
                )
            if src == "s3.amazonaws.com" and name != "ListBuckets":
                rec["requestParameters"] = {
                    "bucketName": f"bkt-{rng.randint(0, 9)}",
                    "key": f"data/{rng.randint(0, 999)}.parquet",
                }
            elif name == "RunInstances":
                rec["requestParameters"] = {
                    "instanceType": rng.choice(["m5.large", "r5.xlarge"]),
                    "minCount": 1,
                    "maxCount": rng.randint(1, 4),
                }
            if name == "AssumeRole" and rng.random() < 0.5:
                rec["responseElements"] = {
                    "credentials": {"expiration": "2024-08-01T00:00:00Z"}
                }
            if rng.random() < 0.08:
                rec["errorCode"] = rng.choice(["AccessDenied", "ThrottlingException"])
                rec["errorMessage"] = "operation failed"
            records.append(rec)
        lines.append(json.dumps({"Records": records}, separators=(",", ":")))
    return lines


# ---------------------------------------------------------------------------
# Spark 4 Python DataSource: synthetic S3 access-log lines as a first-class
# parallel source (spark.read.format("synthetic_s3_logs"))
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0 only
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _SyntheticLogPartition(InputPartition):
        def __init__(self, index: int, n_lines: int, seed: int):
            self.index = index
            self.n_lines = n_lines
            self.seed = seed

    class _SyntheticLogReader(DataSourceReader):
        def __init__(self, options):
            self.n_partitions = int(options.get("partitions", "4"))
            self.lines_per_partition = int(options.get("lines_per_partition", "1000"))
            self.seed = int(options.get("seed", "42"))

        def partitions(self):
            return [
                _SyntheticLogPartition(i, self.lines_per_partition, self.seed + i)
                for i in range(self.n_partitions)
            ]

        def read(self, partition: "_SyntheticLogPartition"):
            # deterministic per-partition generation — each task re-derives
            # its slice from (seed + partition index); no driver-side data
            for line in generate_log_lines(partition.n_lines, seed=partition.seed):
                yield (line,)

    class SyntheticS3LogDataSource(DataSource):
        """Spark 4 Python DataSource emitting synthetic S3 access-log lines.

        The extensibility demo SURVEY §4.3 calls for: a source that is not a
        file format, registered like any other (`spark.dataSource.register`),
        read with `spark.read.format("synthetic_s3_logs")`, planned with one
        task per InputPartition (parallel, no driver materialization, no
        shuffle). Feeds the same native-expression parsers as file input —
        load-generation and soak tests without touching object storage.
        """

        @classmethod
        def name(cls):
            return "synthetic_s3_logs"

        def schema(self):
            return "value string"

        def reader(self, schema):
            return _SyntheticLogReader(self.options)

except ImportError:  # pragma: no cover - pyspark < 4
    SyntheticS3LogDataSource = None  # type: ignore[assignment]
