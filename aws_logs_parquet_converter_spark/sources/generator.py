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
