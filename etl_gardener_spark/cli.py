"""Command-line entry points, mirroring the reference's binaries:

    python -m etl_gardener_spark load  ...   (cmd/load/load.go:42-79)
    python -m etl_gardener_spark copy  ...   (cmd/copy/copy.go:44-93)
    python -m etl_gardener_spark serve ...   (cmd/gardener/gardener.go:222-309)

``load`` runs T1 standalone for one (experiment, datatype, date); ``copy``
runs T3; ``serve`` boots the full control plane (tracker recovery, monitor,
Jobs API) from a YAML config. Schemas for ``load`` come from a JSON file of
Spark StructType.jsonValue() (schema-on-read is explicit in production —
inference would be a second full pass over the data).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from datetime import date as Date

from pyspark.sql import types as T


def _schema_from_json(path: str) -> T.StructType:
    with open(path) as f:
        return T.StructType.fromJson(json.load(f))


def _spark():
    from etl_gardener_spark.session import get_spark

    return get_spark(app_name="etl-gardener-spark-cli")


def cmd_load(args) -> int:
    from etl_gardener_spark.table_ops import JobSpec, TableOps
    from etl_gardener_spark.warehouse import Warehouse

    ops = TableOps(
        _spark(),
        Warehouse(args.warehouse),
        JobSpec(args.experiment, args.datatype, Date.fromisoformat(args.date)),
    )
    st = ops.load_to_tmp(args.source, _schema_from_json(args.schema))
    print(json.dumps(st.__dict__, default=str))
    return 0


def cmd_copy(args) -> int:
    from etl_gardener_spark.table_ops import JobSpec, TableOps
    from etl_gardener_spark.warehouse import Warehouse

    ops = TableOps(
        _spark(),
        Warehouse(args.warehouse),
        JobSpec(args.experiment, args.datatype, Date.fromisoformat(args.date)),
    )
    st = ops.copy_to_raw(dry_run=args.dry_run)
    print(json.dumps(st.__dict__, default=str))
    return 0


def cmd_backfill(args) -> int:
    """Drive the full T1-T5 pipeline for every (source, date) in a range —
    the reference's historical sweep (job-service/iterators.go:114-128)
    compressed into one synchronous command: seed the jobs, mark them
    postProcessing (no parser involved for already-landed JSONL), and
    drain the monitor. Days are independent partitions, so the monitor
    runs them concurrently. Rerunning a range is idempotent: completed
    and failed jobs are re-seeded (every stage replaces its own
    partition), while jobs recovered mid-chain from a previous
    interrupted run resume from their persisted state instead of being
    reset."""
    from datetime import timedelta

    from etl_gardener_spark.orchestrator import job as J
    from etl_gardener_spark.orchestrator.config import load_config
    from etl_gardener_spark.orchestrator.gardener import Gardener
    from etl_gardener_spark.orchestrator.tracker import JobExistsError

    cfg = load_config(args.config)
    start = Date.fromisoformat(args.start)
    end = Date.fromisoformat(args.end)
    if start > end:
        print(json.dumps({"error": f"--start {start} is after --end {end}"}))
        return 2
    if not cfg.sources:
        print(json.dumps({"error": "config has no sources"}))
        return 2
    g = Gardener(
        _spark(),
        cfg,
        warehouse_root=args.warehouse,
        landing_root=args.landing,
        schema_for=lambda job: _schema_from_json(args.schema),
        state_dir=args.state_dir,
        retry_delay_sec=1.0,
    )
    jobs = []
    d = start
    while d <= end:
        for src in cfg.sources:
            job = src.job_spec().with_date(d)
            try:
                g.tracker.add_job(job)
                g.tracker.set_status(job.key(), J.PARSE_COMPLETE)
            except JobExistsError:
                # Recovered non-terminal job from an interrupted run:
                # leave mid-chain state alone (the monitor resumes it) —
                # EXCEPT a job snapshotted in 'init' (crash between
                # add_job and the kickoff set_status), which no action
                # covers and would strand the rerun; kick it off now.
                if g.tracker.get_status(job.key()).state == J.INIT:
                    g.tracker.set_status(job.key(), J.PARSE_COMPLETE)
            jobs.append(job)
        d += timedelta(days=1)
    ok = g.monitor.drain(timeout_sec=args.timeout)
    states = {j.key(): g.tracker.get_status(j.key()).state for j in jobs}
    g.tracker.save(force=True)
    g.monitor.shutdown()
    print(json.dumps({"drained": ok, "jobs": states}))
    return 0 if ok and set(states.values()) == {J.COMPLETE} else 1


def cmd_serve(args) -> int:
    from etl_gardener_spark.orchestrator.config import load_config
    from etl_gardener_spark.orchestrator.gardener import Gardener

    from etl_gardener_spark.orchestrator.config import parse_duration

    cfg = load_config(args.config)
    g = Gardener(
        _spark(),
        cfg,
        warehouse_root=args.warehouse,
        landing_root=args.landing,
        schema_for=lambda job: _schema_from_json(args.schema),
        state_dir=args.state_dir,
        job_expiration_sec=parse_duration(args.job_expiration, 24 * 3600.0),
        cleanup_delay_sec=parse_duration(args.cleanup_delay, 3 * 3600.0),
    )
    g.start(api_port=args.port)
    print(f"gardener serving on :{args.port} (ctrl-c to stop)")
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        g.stop()
    return 0


def cmd_explain(args) -> int:
    """Dry-run for any registered query (the reference's BigQuery dryRun
    made user-facing): build the plan against the real table schemas and
    print it WITHOUT executing — analysis success == query validity, and
    the formatted mode shows pushed filters, scan schemas, and join
    strategies. (Exercised-for-real queries — scratch-warehouse and
    streaming entries — materialize their scratch state while being
    built; the RETURNED plan is still not executed.)"""
    from etl_gardener_spark.plans import queries as Q
    from etl_gardener_spark.plans.explain import explain_str

    reg = Q.REGISTRY
    if args.query == "list":
        for name in reg:
            print(name)
        return 0
    if args.query not in reg:
        print(f"unknown query {args.query!r}; try 'explain list'")
        return 2
    df = reg[args.query].fn(_spark(), args.sf_dir)
    print(explain_str(df, args.mode))
    return 0


def cmd_vacuum(args) -> int:
    """Sweep orphaned staging dirs older than --min-age (warehouse
    hygiene; safe to run while ops are in flight — age-gated)."""
    from etl_gardener_spark.warehouse import vacuum_staging

    removed = vacuum_staging(_spark(), args.warehouse, args.min_age)
    print(json.dumps({"removed": removed}))
    return 0


def cmd_recover(args) -> int:
    """Complete or abort interrupted staged swaps (crash recovery). Run
    at startup BEFORE any other op — Gardener's serve path does this
    automatically; this command is the standalone equivalent for
    driver-less warehouses."""
    from etl_gardener_spark.warehouse import recover_staging

    out = recover_staging(_spark(), args.warehouse)
    print(json.dumps(out))
    # a failed swap completion leaves a partition's only copy stranded
    # under _staging — non-zero so cron/operators notice.
    return 1 if out.get("failed") else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_gardener_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser(
        "explain", help="print a registered query's plan without executing"
    )
    pe.add_argument("query", help="query name from the registry, or 'list'")
    pe.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    pe.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "codegen", "cost", "formatted"],
    )
    pe.set_defaults(fn=cmd_explain)

    pl = sub.add_parser("load", help="T1: load a JSONL day prefix into tmp")
    pl.add_argument("--source", required=True, help="JSONL prefix directory")
    pl.add_argument("--warehouse", required=True)
    pl.add_argument("--experiment", required=True)
    pl.add_argument("--datatype", required=True)
    pl.add_argument("--date", required=True, help="YYYY-MM-DD")
    pl.add_argument("--schema", required=True, help="StructType JSON file")
    pl.set_defaults(fn=cmd_load)

    pc = sub.add_parser("copy", help="T3: copy tmp day partition to raw")
    pc.add_argument("--warehouse", required=True)
    pc.add_argument("--experiment", required=True)
    pc.add_argument("--datatype", required=True)
    pc.add_argument("--date", required=True)
    pc.add_argument("--dry-run", action="store_true")
    pc.set_defaults(fn=cmd_copy)

    pb = sub.add_parser(
        "backfill", help="run the full pipeline over a date range and exit"
    )
    pb.add_argument("--config", required=True, help="gardener YAML config")
    pb.add_argument("--warehouse", required=True)
    pb.add_argument("--landing", required=True)
    pb.add_argument("--schema", required=True)
    pb.add_argument("--state-dir", required=True)
    pb.add_argument("--start", required=True, help="YYYY-MM-DD inclusive")
    pb.add_argument("--end", required=True, help="YYYY-MM-DD inclusive")
    pb.add_argument("--timeout", type=float, default=600.0)
    pb.set_defaults(fn=cmd_backfill)

    ps = sub.add_parser("serve", help="boot the full control plane")
    ps.add_argument("--config", required=True, help="gardener YAML config")
    ps.add_argument("--warehouse", required=True)
    ps.add_argument("--landing", required=True)
    ps.add_argument("--schema", required=True)
    ps.add_argument("--state-dir", required=True)
    ps.add_argument("--port", type=int, default=8080)
    ps.add_argument(
        "--job-expiration", default="24h",
        help="purge jobs with no updates for this long (reference "
        "-job_expiration_time)",
    )
    ps.add_argument(
        "--cleanup-delay", default="3h",
        help="remove terminal jobs after this long (reference "
        "-job_cleanup_delay)",
    )
    ps.set_defaults(fn=cmd_serve)

    pv = sub.add_parser(
        "vacuum", help="sweep orphaned _staging dirs (age-gated)"
    )
    pv.add_argument("--warehouse", required=True)
    pv.add_argument(
        "--min-age", type=float, default=3600.0,
        help="only remove staging dirs idle at least this many seconds",
    )
    pv.set_defaults(fn=cmd_vacuum)

    pr = sub.add_parser(
        "recover",
        help="complete/abort interrupted staged swaps (run at startup)",
    )
    pr.add_argument("--warehouse", required=True)
    pr.set_defaults(fn=cmd_recover)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
