"""Orchestration analog of the reference's scheduled state machine.

The reference schedules the daily job with EventBridge cron -> Step Function
-> EMR job run + a 60 s status-poll loop, Succeed/Fail states, and a
CloudWatch metric filter on "FAIL" wired to an SNS alarm
(``deploy/template.yaml:21-24,139-169``, ``deploy/statemachine.asl.json:25-67``).

In a Spark-native engine the scheduler is external by definition (cron,
Airflow, Dagster, EventBridge — all just invoke the CLI); what belongs IN the
engine is the part the reference delegates to the state machine: per-day
retry with backoff, a machine-readable run record, and a failure hook for
alarming. This module provides exactly that, engine-side and dependency-free:

* :func:`run_with_retries` — the daily/backfill loop where each day is
  attempted up to ``max_attempts`` times with exponential backoff. A day
  that keeps failing does NOT abort the rest of a backfill (each date is an
  independent, idempotent overwrite — reference semantics); it is recorded
  as failed and reported at the end.
* :class:`RunReport` — per-day attempt counts, wall seconds, and terminal
  status (``succeeded`` / ``failed`` / ``skipped`` for dates with no input),
  JSON-serializable for the caller's alerting pipe (the CloudWatch-metric
  analog: grep the report for ``failed`` instead of the log for "FAIL").
* ``on_failure`` hook — invoked once per terminally-failed day with the
  exception; plug in SNS/Slack/pager here. Exceptions in the hook are
  swallowed (an alarm must never take down the pipeline).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from datetime import date
from typing import Callable

from pyspark.sql import SparkSession

from .incremental import (
    RollupConfig,
    compact_day,
    dates_to_process,
    discover_folders,
)

log = logging.getLogger(__name__)


@dataclass
class DayRun:
    day: str
    status: str  # succeeded | failed | skipped
    attempts: int
    wall_seconds: float
    error: str | None = None
    folder: str | None = None  # logged-bucket folder in multi-folder runs


@dataclass
class RunReport:
    days: list[DayRun] = field(default_factory=list)

    @property
    def failed(self) -> list[DayRun]:
        return [d for d in self.days if d.status == "failed"]

    @property
    def succeeded(self) -> list[DayRun]:
        return [d for d in self.days if d.status == "succeeded"]

    def to_dict(self) -> dict:
        return {
            "days": [vars(d) for d in self.days],
            "n_succeeded": len(self.succeeded),
            "n_failed": len(self.failed),
        }


def run_with_retries(
    spark: SparkSession,
    cfg: RollupConfig,
    today: date | None = None,
    max_attempts: int = 3,
    backoff_seconds: float = 1.0,
    on_failure: Callable[[str, Exception], None] | None = None,
    _sleep: Callable[[float], None] = time.sleep,
) -> RunReport:
    """Daily/backfill loop with per-day retry + backoff + failure hook.

    Retrying a day is safe because each (date, destination) write is an
    idempotent overwrite (``write_compacted`` dynamic-overwrite; reference
    ``s3_server_access_logs.py:459``) — a half-written attempt is simply
    replaced. Backoff doubles per attempt (1s, 2s, 4s ... by default),
    mirroring the state machine's wait-and-repoll loop without parking a
    cluster on a 60 s timer.
    """
    report = RunReport()
    # Multi-folder mode: the retry unit of work becomes (day, folder), so one
    # failing logged bucket retries and alarms alone instead of re-running
    # every bucket for that day (reruns are idempotent either way).
    folders: list[str | None]
    if cfg.folders == ():
        folders = [None]
    else:
        folders = list(
            cfg.folders
            if cfg.folders is not None
            else discover_folders(spark, cfg.source_root)
        )
    for day in dates_to_process(cfg, today):
        for folder in folders:
            t0 = time.time()
            last_err: Exception | None = None
            status = "failed"
            attempts = 0
            for attempt in range(1, max_attempts + 1):
                attempts = attempt
                try:
                    elapsed = compact_day(spark, cfg, day, folder)
                    status = "skipped" if elapsed is None else "succeeded"
                    last_err = None
                    break
                except Exception as e:  # noqa: BLE001 - anything may fail mid-job
                    last_err = e
                    log.warning(
                        "day %s folder=%s attempt %d/%d failed: %s",
                        day, folder, attempt, max_attempts, e,
                    )
                    if attempt < max_attempts:
                        _sleep(backoff_seconds * (2 ** (attempt - 1)))
            if last_err is not None and on_failure is not None:
                unit = day.isoformat() if folder is None else f"{folder}/{day.isoformat()}"
                try:
                    on_failure(unit, last_err)
                except Exception:  # noqa: BLE001 - alarms must not kill the run
                    log.exception("on_failure hook raised for %s", unit)
            report.days.append(
                DayRun(
                    day=day.isoformat(),
                    status=status,
                    attempts=attempts,
                    wall_seconds=round(time.time() - t0, 3),
                    error=str(last_err) if last_err else None,
                    folder=folder,
                )
            )
    return report
