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
    #: Multi-folder mode (reference ``s3_server_access_logs.py:334-351``):
    #: one logged-bucket folder per immediate child of ``source_root``, each
    #: compacted to its own ``{destination_root}/{folder}`` subtree in the
    #: SAME run. ``folders=()`` (default) = single-folder mode, roots used
    #: as-is. ``folders=None`` = discover the folder list from the
    #: filesystem (``discover_folders``). An explicit tuple pins the list.
    folders: tuple[str, ...] | None = ()


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


def discover_folders(spark: SparkSession, source_root: str) -> list[str]:
    """List the logged-bucket folders: the immediate child directories of
    ``source_root``.

    The reference does this with a delimiter-limited ListObjectsV2 over the
    ``{account}/{region}/`` prefix (``s3_server_access_logs.py:334-351``) —
    a driver-side metadata call sized by the number of logged buckets, not
    by the number of log objects. The Hadoop FileSystem equivalent
    (``listStatus`` + directory filter) is the same O(#folders) operation
    and works unchanged on ``file://``, ``s3a://``, or any configured FS.
    """
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(source_root)
    fs = path.getFileSystem(hconf)
    if not fs.exists(path):
        return []
    return sorted(
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.isDirectory()
    )


def input_path_for(cfg: RollupConfig, day: date, folder: str | None = None) -> str:
    root = f"{cfg.source_root}/{folder}" if folder else cfg.source_root
    return f"{root}/{day.strftime(cfg.date_path_format)}/*"


def destination_for(cfg: RollupConfig, day: date, folder: str | None = None) -> str:
    # Per-folder destination subtree, like the reference's
    # ``{dest}/{source_bucket}{date}`` template (s3_server_access_logs.py:445-450).
    root = f"{cfg.destination_root}/{folder}" if folder else cfg.destination_root
    if cfg.policy.hive_partitioning:
        # partition dirs are produced by the writer; destination is the table root
        return root
    return f"{root}/{day.strftime('%Y/%m/%d')}"


def compact_day(
    spark: SparkSession, cfg: RollupConfig, day: date, folder: str | None = None
) -> float | None:
    """Parse + compact one day of raw logs (optionally scoped to one logged
    bucket ``folder``); returns elapsed seconds, or None when the date has
    no input (skipped, like the reference's len(paths)>0 guard at
    s3_server_access_logs.py:394)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    t0 = time.time()
    ts_col = TS_COL[cfg.log_format]
    policy = cfg.policy
    if policy.sort_keys == ("request_time",) and ts_col != "request_time":
        from dataclasses import replace

        policy = replace(policy, sort_keys=(ts_col,))
    try:
        parsed = read_logs(
            spark, input_path_for(cfg, day, folder), fmt=cfg.log_format
        )
        dq = write_compacted(
            parsed,
            destination_for(cfg, day, folder),
            policy,
            ts_col=ts_col,
            observe=True,
        )
    except AnalysisException as e:
        if "PATH_NOT_FOUND" in str(e):
            log.info("no input for %s folder=%s; skipping", day, folder)
            return None
        raise
    elapsed = time.time() - t0
    log.info(
        "compacted %s folder=%s in %.1fs (observed: %s)", day, folder, elapsed, dq
    )
    return elapsed


def run(spark: SparkSession, cfg: RollupConfig, today: date | None = None) -> list[date]:
    """Execute the daily/backfill loop; returns the dates actually compacted.

    Multi-folder mode (``cfg.folders`` is None or a non-empty tuple) mirrors
    the reference's outer loop (``s3_server_access_logs.py:377-383``): every
    discovered logged-bucket folder is compacted for every due date in the
    one invocation, each into its own destination subtree. A date counts as
    processed if ANY folder had input for it.
    """
    folders: list[str | None]
    if cfg.folders == ():
        folders = [None]
    else:
        folders = list(
            cfg.folders
            if cfg.folders is not None
            else discover_folders(spark, cfg.source_root)
        )
        log.info("found %d folders to process", len(folders))
    processed = []
    for day in dates_to_process(cfg, today):
        hit = False
        for folder in folders:
            if compact_day(spark, cfg, day, folder) is not None:
                hit = True
        if hit:
            processed.append(day)
    return processed
