"""CLI mirroring the reference's argument surface
(``s3_server_access_logs.py:469-534``), adapted to engine-native knobs:
bucket/credential arguments become source/destination roots (any Hadoop
filesystem URI: file://, s3a://, ...).
"""

from __future__ import annotations

import argparse
from datetime import date

from .plans.compact import CompactionPolicy
from .plans.incremental import RollupConfig, run
from .session import build_session


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="AWS log compactor (Spark-native): S3 / ALB / VPC-flow")
    p.add_argument("--source-root", required=True, help="Root URI of raw log files")
    p.add_argument(
        "--destination-root",
        default=None,
        help="Root URI for compacted parquet. Default: <source-root>/processed",
    )
    p.add_argument("--lookback-days", default=1, type=int, help="Days back to process (default 1)")
    p.add_argument("--start-date", default=None, help="ISO date: backfill from here to lookback boundary")
    p.add_argument("--num-output-files", default=10, type=int, help="Output files per day (default 10)")
    p.add_argument(
        "--target-file-mb",
        default=None,
        type=int,
        help="Size-aware file count: derive files-per-day from input volume "
        "(ceil(bytes / target)) instead of a fixed --num-output-files — "
        "bounds each write task's sort/compress slice so big days don't "
        "collapse onto few spilling tasks (measured 22x at 10x data with "
        "a fixed count)",
    )
    p.add_argument(
        "--hive-formatted-folders",
        action="store_true",
        help="Write real year=/month=/day= partition columns instead of plain date paths",
    )
    p.add_argument("--max-records-per-file", default=None, type=int)
    p.add_argument(
        "--log-format",
        default="s3",
        choices=["s3", "alb", "vpcflow", "cloudfront", "cloudtrail"],
        help="Input log format (default s3 server-access-log)",
    )
    p.add_argument("--master", default=None, help="Spark master override (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument(
        "--cloud",
        action="store_true",
        help="Ship hadoop-aws and an object-store-safe committer for s3a:// "
        "roots. Credentials resolve via the S3A default provider chain "
        "(env vars -> profile -> IAM role); no keys on the command line.",
    )
    p.add_argument(
        "--max-attempts",
        default=1,
        type=int,
        help="Per-day retry attempts with exponential backoff (default 1 = "
        "no retry). Failed days are reported and alarmed, never abort a "
        "backfill; reruns are idempotent overwrites.",
    )
    p.add_argument(
        "--multi-folder",
        action="store_true",
        help="Treat each immediate child directory of --source-root as a "
        "logged-bucket folder (the reference's per-bucket layout) and "
        "compact every folder to its own <destination-root>/<folder> "
        "subtree in one run",
    )
    p.add_argument(
        "--folders",
        default=None,
        help="Comma-separated explicit folder list (implies --multi-folder; "
        "skips filesystem discovery)",
    )
    p.add_argument(
        "--retain-days",
        default=None,
        type=int,
        help="After the run, expire destination DAY directories older than "
        "this many days (both plain and hive date layouts) — the "
        "reference users' S3 lifecycle rule, in-engine. Driver-side "
        "metadata sweep; survivor partitions never touched.",
    )
    p.add_argument(
        "--committer",
        default="v2",
        choices=["v2", "magic"],
        help="Object-store commit protocol when --cloud: fileoutputcommitter "
        "algorithm v2 (reference parity) or the S3A magic committer",
    )
    p.add_argument(
        "--optimize-after",
        action="store_true",
        help="After the run (and retention sweep), bin-pack small-file day "
        "partitions under the destination tree (plans/optimize.py): the "
        "date tree is walked to month level (plain YYYY/MM or hive "
        "year=/month=), then each month's day dirs pack via metadata-only "
        "selection + concurrent swap-by-rename rewrites targeting "
        "--target-file-mb (default 128).",
    )
    return p.parse_args(argv)


def config_from_args(args: argparse.Namespace) -> RollupConfig:
    folders: tuple[str, ...] | None = ()
    if getattr(args, "folders", None):
        folders = tuple(f.strip() for f in args.folders.split(",") if f.strip())
    elif getattr(args, "multi_folder", False):
        folders = None  # discover from the filesystem at run time
    return RollupConfig(
        source_root=args.source_root,
        destination_root=args.destination_root or f"{args.source_root}/processed",
        lookback_days=args.lookback_days,
        start_date=args.start_date,
        log_format=args.log_format,
        folders=folders,
        policy=CompactionPolicy(
            num_output_files=None if args.target_file_mb else args.num_output_files,
            target_file_mb=args.target_file_mb,
            hive_partitioning=args.hive_formatted_folders,
            max_records_per_file=args.max_records_per_file,
        ),
    )


def _maintenance_roots(spark, cfg: RollupConfig) -> list[str]:
    """Destination subtrees the post-run maintenance stages (retention,
    optimize-after) operate on — ONE derivation so the stages cannot
    disagree. Multi-folder mode discovers from the DESTINATION tree (a
    folder that stopped producing source logs still has old compacted
    data to maintain), falling back to source discovery only for a
    destination that does not exist yet."""
    from .plans.incremental import discover_folders

    if cfg.folders == ():
        return [cfg.destination_root]
    names = list(cfg.folders) if cfg.folders else (
        discover_folders(spark, cfg.destination_root)
        or discover_folders(spark, cfg.source_root)
    )
    return [f"{cfg.destination_root}/{f}" for f in names]


def main(argv: list[str] | None = None) -> None:
    args = parse_arguments(argv)
    cfg = config_from_args(args)
    spark = build_session(
        app_name="log_compactor",
        master=args.master,
        cloud=args.cloud,
        committer=args.committer,
    )
    try:
        if args.max_attempts > 1:
            from .plans.orchestrate import run_with_retries

            report = run_with_retries(
                spark, cfg, today=date.today(), max_attempts=args.max_attempts
            )
            import json as _json

            print(_json.dumps(report.to_dict()))
            if report.failed:
                raise SystemExit(1)
        else:
            processed = run(spark, cfg, today=date.today())
            print(f"processed {len(processed)} day(s): {[d.isoformat() for d in processed]}")
        if args.retain_days is not None:
            from datetime import timedelta

            from .plans.retention import expire_date_partitions

            keep_from = date.today() - timedelta(days=args.retain_days)
            roots = _maintenance_roots(spark, cfg)
            expired = [
                day
                for r in roots
                for day in expire_date_partitions(
                    spark, r, keep_from, hive=cfg.policy.hive_partitioning
                )
            ]
            print(f"expired {len(expired)} partition dir(s) below {keep_from.isoformat()}")
        if args.optimize_after:
            from .plans.optimize import optimize_partitions
            from .plans.retention import list_month_dirs

            roots = _maintenance_roots(spark, cfg)
            hive = cfg.policy.hive_partitioning
            # sweep at MONTH granularity: each month dir's children are the
            # day partitions (plain DD dirs or hive day=DD), so the packer
            # rewrites whole days and never disturbs the date-tree nesting
            packed = [
                v
                for r in roots
                for month in list_month_dirs(spark, r, hive=hive)
                for v in optimize_partitions(
                    spark,
                    month,
                    "day" if hive else None,
                    target_file_mb=args.target_file_mb or 128,
                )
            ]
            print(f"optimized {len(packed)} fragmented day partition(s)")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
