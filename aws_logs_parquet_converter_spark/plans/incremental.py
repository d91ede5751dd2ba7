"""Incremental (daily) and backfill compaction drivers.

Re-expresses the reference's job loop (``s3_server_access_logs.py:353-466``):
default run = yesterday (lookback_days), ``--start-date`` switches to a
backfill loop of one compaction per day, each (bucket, date) written with
overwrite semantics so reruns are idempotent.

Spark-native difference: per-date input discovery is a path template handed to
``spark.read.text`` (distributed listing, small-file packing) instead of a
driver-side ListObjects loop; discovery of the per-bucket "folders" becomes a
filesystem glob.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from datetime import date, datetime, timedelta

from pyspark.sql import SparkSession

from ..sources.registry import read_logs
from .compact import CompactionPolicy, write_compacted

# event-time column per log format (drives clustering + date partitioning)
TS_COL = {
    "s3": "request_time",
    "alb": "time",
    "vpcflow": "start_ts",
    "cloudfront": "request_ts",
}

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class RollupConfig:
    """Knobs mirroring the reference CLI (O20) minus AWS credentials."""

    source_root: str  # e.g. s3a://bucket/prefix or a local dir
    destination_root: str
    lookback_days: int = 1
    start_date: str | None = None  # ISO date -> backfill mode
    policy: CompactionPolicy = CompactionPolicy()
    date_path_format: str = "%Y/%m/%d"  # raw-log input layout
    log_format: str = "s3"  # s3 | alb | vpcflow | cloudfront (sources/registry.py)


def dates_to_process(cfg: RollupConfig, today: date | None = None) -> list[date]:
    """Single lookback date, or every day from start_date to the lookback
    boundary (inclusive) for backfills — the reference's loop, as data."""
    today = today or date.today()
    boundary = today - timedelta(days=cfg.lookback_days)
    if not cfg.start_date:
        return [boundary]
    start = datetime.strptime(cfg.start_date, "%Y-%m-%d").date()
    out = []
    d = start
    while d <= boundary:
        out.append(d)
        d += timedelta(days=1)
    return out


def input_path_for(cfg: RollupConfig, day: date) -> str:
    return f"{cfg.source_root}/{day.strftime(cfg.date_path_format)}/*"


def destination_for(cfg: RollupConfig, day: date) -> str:
    if cfg.policy.hive_partitioning:
        # partition dirs are produced by the writer; destination is the table root
        return cfg.destination_root
    return f"{cfg.destination_root}/{day.strftime('%Y/%m/%d')}"


def compact_day(spark: SparkSession, cfg: RollupConfig, day: date) -> float | None:
    """Parse + compact one day of raw logs; returns elapsed seconds, or None
    when the date has no input (skipped, like the reference's len(paths)>0
    guard at s3_server_access_logs.py:394)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    t0 = time.time()
    ts_col = TS_COL[cfg.log_format]
    policy = cfg.policy
    if policy.sort_keys == ("request_time",) and ts_col != "request_time":
        from dataclasses import replace

        policy = replace(policy, sort_keys=(ts_col,))
    try:
        parsed = read_logs(spark, input_path_for(cfg, day), fmt=cfg.log_format)
        dq = write_compacted(
            parsed, destination_for(cfg, day), policy, ts_col=ts_col, observe=True
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            log.info("no input for %s; skipping", day)
            return None
        raise
    elapsed = time.time() - t0
    log.info("compacted %s in %.1fs (observed: %s)", day, elapsed, dq)
    return elapsed


def run(spark: SparkSession, cfg: RollupConfig, today: date | None = None) -> list[date]:
    """Execute the daily/backfill loop; returns the dates actually compacted."""
    processed = []
    for day in dates_to_process(cfg, today):
        if compact_day(spark, cfg, day) is not None:
            processed.append(day)
    return processed
