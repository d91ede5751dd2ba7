"""Maintenance CLI for snapshot-manifest tables (plans/snapshots.py) —
the operational surface a table owner schedules: DESCRIBE HISTORY,
OPTIMIZE (plain / clustered / z-ordered), VACUUM, RESTORE, metadata-only
column RENAME, SHALLOW CLONE, and SET-AUTO-COMPACT (the
auto-compaction table property, set or cleared post-hoc). One
subcommand per verb, one Spark
session per invocation, table roots are any Hadoop filesystem URI (the
same contract as the log-compactor CLI).

Usage:
    python -m aws_logs_parquet_converter_spark.cli_tables history  --root /t
    python -m aws_logs_parquet_converter_spark.cli_tables optimize --root /t \
        --target-file-mb 128 [--cluster-by day] [--zorder-by a,b]
    python -m aws_logs_parquet_converter_spark.cli_tables vacuum   --root /t \
        --keep-last 3 [--min-age-seconds 86400]
    python -m aws_logs_parquet_converter_spark.cli_tables restore  --root /t --version 4
    python -m aws_logs_parquet_converter_spark.cli_tables rename   --root /t \
        --column user_id --to uid
    python -m aws_logs_parquet_converter_spark.cli_tables clone    --root /src \
        --dest /dst [--version 4]
    python -m aws_logs_parquet_converter_spark.cli_tables set-auto-compact \
        --root /t [--target-mb 128]   # omit --target-mb to clear
    python -m aws_logs_parquet_converter_spark.cli_tables view     --root /t \
        --name t_v [--version 4 | --timestamp 1755350000] \
        [--sql "SELECT count(*) AS n FROM t_v"]   # SELECT only: DML uses
                                                  # the Python verbs
"""

from __future__ import annotations

import argparse
import json

from .session import build_session


def parse_arguments(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Snapshot-table maintenance: history/optimize/vacuum/"
        "restore/rename/drop-column/add-constraint/drop-constraint/"
        "repartition/clone/set-auto-compact"
    )
    p.add_argument("--master", default=None, help="Spark master override")
    sub = p.add_subparsers(dest="verb", required=True)

    hist = sub.add_parser("history", help="DESCRIBE HISTORY as JSON lines")
    hist.add_argument("--root", required=True)

    invp = sub.add_parser(
        "inventory",
        help="per-file detail of one version (sizes, row counts, "
        "partition values, min/max stats) — aggregated summary as JSON; "
        "use --out to write the full inventory as parquet",
    )
    invp.add_argument("--root", required=True)
    invp.add_argument("--version", type=int, default=None)
    invp.add_argument(
        "--out", default=None,
        help="optional parquet output path for the full per-file frame "
        "(written distributed; the summary JSON prints either way)",
    )

    opt = sub.add_parser("optimize", help="bin-pack (and optionally cluster) files")
    opt.add_argument("--root", required=True)
    opt.add_argument("--target-file-mb", type=float, default=128)
    opt.add_argument(
        "--cluster-by", default=None,
        help="comma-separated columns: range-cluster + sort the rewrite",
    )
    opt.add_argument(
        "--zorder-by", default=None,
        help="two comma-separated columns: Morton-interleaved 2-D clustering",
    )
    opt.add_argument(
        "--small-file-mb", type=float, default=None,
        help="incremental pack threshold (default target/2): only files "
        "under this size, plus dv-touched ones, are rewritten",
    )
    opt.add_argument(
        "--full", action="store_true",
        help="force a whole-table rewrite (cluster/zorder imply it)",
    )

    vac = sub.add_parser("vacuum", help="retire versions outside the window")
    vac.add_argument("--root", required=True)
    vac.add_argument("--keep-last", type=int, default=3)
    vac.add_argument(
        "--min-age-seconds", type=float, default=None,
        help="grace window shielding in-flight commit dirs (default: the "
        "library's Delta-style retention default)",
    )
    vac.add_argument(
        "--dry-run", action="store_true",
        help="report what would be retired without deleting anything",
    )
    vac.add_argument(
        "--retain-hours", type=float, default=None,
        help="ALSO keep every version committed within this window "
        "(Delta's VACUUM ... RETAIN; by in-commit timestamp)",
    )

    res = sub.add_parser(
        "restore",
        help="metadata-only rollback to a version or timestamp",
    )
    res.add_argument("--root", required=True)
    res.add_argument("--version", type=int, default=None)
    res.add_argument(
        "--timestamp", type=float, default=None,
        help="epoch seconds: restore to the newest version committed "
        "at-or-before this instant (in-commit-timestamp resolved)",
    )

    ren = sub.add_parser("rename", help="metadata-only column rename")
    ren.add_argument("--root", required=True)
    ren.add_argument("--column", required=True)
    ren.add_argument("--to", required=True)

    drp = sub.add_parser(
        "drop-column",
        help="metadata-only column drop (tombstoned against re-add "
        "resurrection; zero data I/O)",
    )
    drp.add_argument("--root", required=True)
    drp.add_argument("--column", required=True)

    adc = sub.add_parser(
        "add-constraint",
        help="ALTER TABLE ... ADD CONSTRAINT: validate current data "
        "once, then enforce on every future commit",
    )
    adc.add_argument("--root", required=True)
    adc.add_argument("--name", required=True)
    adc.add_argument("--expr", required=True, help="SQL boolean expression")

    ddc = sub.add_parser(
        "drop-constraint",
        help="ALTER TABLE ... DROP CONSTRAINT (metadata-only)",
    )
    ddc.add_argument("--root", required=True)
    ddc.add_argument("--name", required=True)

    sac = sub.add_parser(
        "set-auto-compact",
        help="set/clear the auto_compact_mb table property (metadata-only)",
    )
    sac.add_argument("--root", required=True)
    sac.add_argument(
        "--target-mb", type=float, default=None,
        help="target file size; omit to CLEAR the property",
    )

    rep = sub.add_parser(
        "repartition",
        help="partition evolution: one rewrite under a new partition_by "
        "scheme (empty --by = unpartitioned)",
    )
    rep.add_argument("--root", required=True)
    rep.add_argument(
        "--by",
        default="",
        help="comma-separated partition columns; empty clears partitioning",
    )
    rep.add_argument("--target-file-mb", type=float, default=128.0)

    cnt = sub.add_parser(
        "count",
        help="COUNT(*) from manifest row stats (metadata-only when "
        "available; exact scan fallback otherwise)",
    )
    cnt.add_argument("--root", required=True)
    cnt.add_argument("--version", type=int, default=None)

    stp = sub.add_parser(
        "streams",
        help="per-stream replay positions: the txns high-water marks "
        "(and any pre-r10 cumulative batch_ids ledger) at a version",
    )
    stp.add_argument("--root", required=True)
    stp.add_argument("--version", type=int, default=None)

    cln = sub.add_parser("clone", help="zero-copy shallow clone")
    cln.add_argument("--root", required=True, help="source table root")
    cln.add_argument("--dest", required=True, help="fresh destination root")
    cln.add_argument("--version", type=int, default=None)

    vw = sub.add_parser(
        "view",
        help="register the table as a temp view (pinned to --version / "
        "--timestamp, else the tip) and optionally run --sql against it",
    )
    vw.add_argument("--root", required=True)
    vw.add_argument("--name", required=True, help="temp view name")
    vw.add_argument("--version", type=int, default=None)
    vw.add_argument(
        "--timestamp", type=float, default=None,
        help="TIMESTAMP AS OF (epoch seconds) — resolved via the "
        "in-commit stamps",
    )
    vw.add_argument(
        "--sql", default=None,
        help="a SELECT to run through spark.sql against the view "
        "(SQL DML is not supported on snapshot tables — use the "
        "Python verbs)",
    )
    vw.add_argument(
        "--limit", type=int, default=20,
        help="max rows of --sql output to print (default 20)",
    )

    return p.parse_args(argv)


def run_verb(spark, args: argparse.Namespace) -> dict:
    """Dispatch one maintenance verb; returns a JSON-able result dict
    (split from main() so tests drive it on a shared session)."""
    from .plans import snapshots as S

    if args.verb == "history":
        rows = [r.asDict() for r in S.snapshot_history(spark, args.root).collect()]
        return {"verb": "history", "root": args.root, "versions": rows}
    if args.verb == "inventory":
        from pyspark.sql import functions as F

        inv = S.snapshot_inventory(spark, args.root, version=args.version)
        if args.out:
            inv.write.mode("overwrite").parquet(args.out)
        agg = inv.agg(
            F.count("*").alias("n_files"),
            F.sum("size_bytes").alias("total_bytes"),
            F.sum("n_rows").alias("total_rows"),
            F.min("size_bytes").alias("min_file_bytes"),
            F.max("size_bytes").alias("max_file_bytes"),
        ).first()
        return {
            "verb": "inventory",
            "root": args.root,
            "version": args.version,
            "columns": inv.columns,
            "out": args.out,
            **{k: agg[k] for k in agg.asDict()},
        }
    if args.verb == "optimize":
        cluster = (
            [c.strip() for c in args.cluster_by.split(",")] if args.cluster_by else None
        )
        zorder = None
        if args.zorder_by:
            parts = tuple(c.strip() for c in args.zorder_by.split(","))
            if len(parts) != 2:
                raise SystemExit("--zorder-by takes exactly two columns: a,b")
            zorder = parts
        v = S.snapshot_optimize(
            spark, args.root, target_file_mb=args.target_file_mb,
            cluster_by=cluster, zorder_by=zorder,
            small_file_mb=args.small_file_mb, full=args.full,
        )
        return {"verb": "optimize", "root": args.root, "committed_version": v}
    if args.verb == "vacuum":
        kwargs = {"keep_last": args.keep_last, "dry_run": args.dry_run}
        if args.min_age_seconds is not None:
            kwargs["min_age_seconds"] = args.min_age_seconds
        if args.retain_hours is not None:
            kwargs["retain_hours"] = args.retain_hours
        gone = S.snapshot_vacuum(spark, args.root, **kwargs)
        return {
            "verb": "vacuum", "root": args.root, "retired": gone,
            "dry_run": args.dry_run,
        }
    if args.verb == "restore":
        v = S.snapshot_restore(
            spark, args.root, version=args.version, timestamp=args.timestamp
        )
        return {"verb": "restore", "root": args.root, "committed_version": v}
    if args.verb == "rename":
        v = S.snapshot_rename_column(spark, args.root, args.column, args.to)
        return {
            "verb": "rename", "root": args.root,
            "column": args.column, "to": args.to, "committed_version": v,
        }
    if args.verb == "drop-column":
        v = S.snapshot_drop_column(spark, args.root, args.column)
        return {
            "verb": "drop-column", "root": args.root,
            "column": args.column, "committed_version": v,
        }
    if args.verb == "add-constraint":
        v = S.snapshot_add_constraint(spark, args.root, args.name, args.expr)
        return {
            "verb": "add-constraint", "root": args.root,
            "name": args.name, "expr": args.expr, "committed_version": v,
        }
    if args.verb == "drop-constraint":
        v = S.snapshot_drop_constraint(spark, args.root, args.name)
        return {
            "verb": "drop-constraint", "root": args.root,
            "name": args.name, "committed_version": v,
        }
    if args.verb == "streams":
        v = args.version
        if v is None:
            v = S.current_version(spark, args.root)
            if v is None:
                raise SystemExit(f"snapshot table {args.root} has no commits")
        m = S.read_manifest(spark, args.root, v)
        return {
            "verb": "streams",
            "root": args.root,
            "version": v,
            # app id -> highest committed micro-batch (scalar HWM; an
            # orchestrator resumes a stream by asking the TABLE). The
            # stream ledger is its own manifest key, so batch-job
            # txnAppId marks can never masquerade as stream positions
            "stream_txns": m.get("stream_txns", {}),
            # batch-side SetTransaction marks, labeled separately
            "batch_txns": m.get("txns", {}),
            # pre-r10 cumulative list, if the table still carries one
            # (folded into stream_txns["_stream"] by the next stream
            # commit)
            "legacy_batch_ids": m.get("batch_ids", []),
        }
    if args.verb == "count":
        n = S.snapshot_count(spark, args.root, version=args.version)
        return {
            "verb": "count", "root": args.root,
            "version": args.version, "n_rows": n,
        }
    if args.verb == "clone":
        v = S.snapshot_clone(spark, args.root, args.dest, version=args.version)
        return {
            "verb": "clone", "source": args.root, "dest": args.dest,
            "committed_version": v,
        }
    if args.verb == "view":
        v = S.snapshot_view(
            spark, args.root, args.name,
            version=args.version, timestamp=args.timestamp,
        )
        out = {
            "verb": "view", "root": args.root, "name": args.name,
            "pinned_version": v,
        }
        if args.sql:
            rows = spark.sql(args.sql).limit(args.limit).collect()
            out["rows"] = [r.asDict() for r in rows]
        return out
    if args.verb == "repartition":
        by = [c.strip() for c in args.by.split(",") if c.strip()]
        v = S.snapshot_repartition(
            spark, args.root, by, target_file_mb=args.target_file_mb
        )
        return {
            "verb": "repartition", "root": args.root,
            "partition_by": by, "committed_version": v,
        }
    if args.verb == "set-auto-compact":
        v = S.snapshot_set_auto_compact(spark, args.root, args.target_mb)
        return {
            "verb": "set-auto-compact", "root": args.root,
            "target_mb": args.target_mb, "committed_version": v,
        }
    raise SystemExit(f"unknown verb {args.verb!r}")


def main(argv: list[str] | None = None) -> None:
    args = parse_arguments(argv)
    spark = build_session(app_name="snapshot_tables", master=args.master)
    try:
        print(json.dumps(run_verb(spark, args), default=str))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
