"""Curation-chain restart-mid-stage CONVERGENCE at ladder scale (r10
verdict item 6).

The e2e suite proves idempotent stage re-runs at test scale
(tests/test_curation_e2e.py::test_curation_stage_idempotent_rerun);
this runner proves the stronger operational claim AT LADDER SCALE: a
monitor process hard-killed (os._exit, no cleanup) between the
decontam and exact_dedup states, then restarted against the persisted
tracker JSON, converges to byte-identical curated AND packed partitions
as an uninterrupted run of the same input — the reference's
no-leases-survive-restart property (tracker/tracker.go recovery +
ops claim set rebuilt empty) carried through the full 8-stage chain
with real sf1-scale rewrites.

Usage:
    python tools/curation_restart_run.py <sf_dir> [--workdir D]  # parent
    # internal child modes: setup / run [--kill-before STAGE] / hash

The parent runs each phase in a SUBPROCESS (own SparkSession/JVM): the
kill is a real process death mid-watch, and the resume is a real
cold-start recovery from tracker.json.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
from datetime import date as Date

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY = Date(2024, 3, 1)
CHAIN_TIMEOUT = 1800.0


def _spec():
    from etl_gardener_spark.orchestrator.curation import (
        STAGE_ORDER,
        CurationSpec,
    )

    return CurationSpec(
        stages=tuple(STAGE_ORDER),
        text_col="text",
        id_col="id",
        min_quality=0.25,
        jaccard_threshold=0.5,
        num_hashes=12,
        bands=4,
        pack_capacity=2048,
        decontam_bench=("bench", "eval", "suite"),
    )


def _job():
    from etl_gardener_spark.orchestrator import job as J
    from etl_gardener_spark.orchestrator.job import Datasets

    return J.Job(
        bucket="b",
        experiment="corpus",
        datatype="webdocs",
        date=DAY,
        datasets=Datasets(tmp="tmp_c", raw="raw_c", join="c"),
    )


def cmd_setup(root: str, sf_dir: str) -> int:
    """Build the warehouse join partition + decontam benchmark table
    (the curation_scale_run fixture), and a persisted tracker with the
    job parked at the first curation state."""
    from pyspark.sql import functions as F

    from etl_gardener_spark.orchestrator.curation import STAGE_ORDER, state_for
    from etl_gardener_spark.orchestrator.tracker import Tracker
    from etl_gardener_spark.session import get_spark
    from etl_gardener_spark.sources.tables import load_table
    from etl_gardener_spark.warehouse import Warehouse

    spark = get_spark(app_name="curation-restart-setup")
    wh = Warehouse(os.path.join(root, "wh"))
    raw = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    docs = (
        raw.filter(F.col("source") != "src0")
        .join(emb, "doc_id", "left")
        .select(
            F.col("doc_id").alias("id"),
            "text",
            "embedding",
            F.lit(DAY.isoformat()).cast("date").alias("date"),
        )
    )
    wh.overwrite_partitions(docs, "join", "corpus", "webdocs")
    bench = raw.filter(F.col("source") == "src0").select(
        F.col("doc_id").alias("id"),
        "text",
        F.lit("2024-01-01").cast("date").alias("date"),
    )
    wh.overwrite_partitions(bench, "bench", "eval", "suite")
    n0 = wh.read_partition(spark, "join", "corpus", "webdocs", DAY).count()

    os.makedirs(os.path.join(root, "state"), exist_ok=True)
    tracker = Tracker(saver_path=os.path.join(root, "state", "tracker.json"))
    job = _job()
    tracker.add_job(job)
    tracker.set_status(job.key(), state_for(STAGE_ORDER[0]))
    assert tracker.save(force=True)
    print(json.dumps({"rows_in": n0}))
    return 0


def cmd_run(root: str, kill_before: str | None) -> int:
    """Drive the chain through the real Monitor against the persisted
    tracker. With --kill-before STAGE the process os._exit(9)s when the
    monitor dispatches that stage — a hard mid-watch death AFTER the
    prior stage's save-before-advance landed on disk."""
    from etl_gardener_spark.orchestrator import job as J
    from etl_gardener_spark.orchestrator.curation import (
        STAGE_ORDER,
        CurationActions,
        state_for,
    )
    from etl_gardener_spark.orchestrator.monitor import Action, Monitor
    from etl_gardener_spark.orchestrator.tracker import Tracker
    from etl_gardener_spark.session import get_spark
    from etl_gardener_spark.warehouse import Warehouse

    spark = get_spark(app_name="curation-restart-run")
    wh = Warehouse(os.path.join(root, "wh"))
    tracker = Tracker(saver_path=os.path.join(root, "state", "tracker.json"))
    monitor = Monitor(tracker, retry_delay_sec=1.0)
    ca = CurationActions(spark, wh, lambda _j: _spec())

    states = [state_for(s) for s in STAGE_ORDER]
    nexts = states[1:] + [J.COMPLETE]
    for st, nxt, stage in zip(states, nexts, STAGE_ORDER):
        body = ca._stage_action(stage)
        if stage == kill_before:
            def body(job, _stage=stage):  # noqa: ARG001
                # the prior stage's set_status is already persisted by
                # the save_every thread (see sleep); die with no cleanup
                time.sleep(1.0)
                os._exit(9)
        monitor.add_action(Action(st, nxt, body))

    stop = threading.Event()
    tracker.save_every(0.2, stop)
    ok = monitor.drain(timeout_sec=CHAIN_TIMEOUT)
    stop.set()
    tracker.save(force=True)
    job = _job()
    st = tracker.get_status(job.key())
    print(json.dumps({
        "drained": ok,
        "state": st.state if st else None,
        "history": [si.state for si in st.history] if st else [],
    }))
    return 0 if ok and st is not None and st.state == J.COMPLETE else 1


def cmd_hash(root: str) -> int:
    """Stable content hash of the curated join partition and the packed
    tier: md5 over the sorted row reprs."""
    from etl_gardener_spark.session import get_spark
    from etl_gardener_spark.warehouse import Warehouse

    spark = get_spark(app_name="curation-restart-hash")
    wh = Warehouse(os.path.join(root, "wh"))
    out = {}
    for tier, cols in (
        ("join", ("id", "text")),
        ("packed", ("id", "n_tokens", "bin_id")),
    ):
        df = wh.read_partition(spark, tier, "corpus", "webdocs", DAY)
        rows = sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )
        h = hashlib.md5(repr(rows).encode()).hexdigest()
        out[tier] = {"rows": len(rows), "md5": h}
    print(json.dumps(out))
    return 0


def _child(args: list[str]) -> tuple[int, str]:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    return proc.returncode, proc.stdout


def _last_json(stdout: str) -> dict:
    for line in reversed(stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"no JSON line in child output: {stdout[-500:]!r}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("target", help="sf_dir (parent) or workdir root (child)")
    ap.add_argument("--mode", choices=("setup", "run", "hash"), default=None)
    ap.add_argument("--sf-dir", default=None, help="child setup: source data")
    ap.add_argument("--kill-before", default=None)
    ap.add_argument("--workdir", default=None)
    ns = ap.parse_args()

    if ns.mode == "setup":
        return cmd_setup(ns.target, ns.sf_dir)
    if ns.mode == "run":
        return cmd_run(ns.target, ns.kill_before)
    if ns.mode == "hash":
        return cmd_hash(ns.target)

    sf_dir = ns.target
    base = ns.workdir or tempfile.mkdtemp(prefix="etl_gardener_spark_restart_")
    result = {}
    try:
        for variant in ("baseline", "restart"):
            root = os.path.join(base, variant)
            os.makedirs(root, exist_ok=True)
            rc, out = _child([root, "--mode", "setup", "--sf-dir", sf_dir])
            assert rc == 0, f"setup failed ({rc})"
            info = _last_json(out)
            t0 = time.monotonic()
            if variant == "restart":
                rc, out = _child(
                    [root, "--mode", "run", "--kill-before", "exact_dedup"]
                )
                assert rc == 9, f"expected hard-kill exit 9, got {rc}"
                print(f"{variant}: monitor killed before exact_dedup "
                      f"(exit {rc})", flush=True)
            rc, out = _child([root, "--mode", "run"])
            run_info = _last_json(out)
            assert rc == 0, f"run failed ({rc}): {run_info}"
            wall = time.monotonic() - t0
            rc, out = _child([root, "--mode", "hash"])
            assert rc == 0
            result[variant] = {
                "rows_in": info["rows_in"],
                "wall_sec": round(wall, 1),
                "final_state": run_info["state"],
                "resumed_history": run_info["history"],
                "hashes": _last_json(out),
            }
            print(f"{variant}: {json.dumps(result[variant])}", flush=True)
        conv = (
            result["baseline"]["hashes"] == result["restart"]["hashes"]
        )
        print(json.dumps({
            "sf_dir": sf_dir,
            "converged": conv,
            "baseline": result["baseline"]["hashes"],
            "restart": result["restart"]["hashes"],
        }))
        return 0 if conv else 1
    finally:
        if ns.workdir is None:
            shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
