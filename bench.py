"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1}

Each query executes end-to-end into the ``noop`` sink (full plan runs on
executors; no driver-side collect skewing the measurement). Best of two runs
per query — the first run at process start pays JVM/codegen warmup that a
long-lived service never sees.

Besides wall-clock, each query also records executor TASK-TIME (the sum
of executorRunTime over the run's stages, from Spark's AppStatusStore —
the local-mode analogue of BigQuery slot-seconds, the reference's only
published cost unit). Task-time is scheduler-noise-robust: wall-clock on
a shared box swings ±15% with CPU contention while task-time tracks the
actual work, so cross-round comparisons (tools/bench_trend.py) should
prefer ``queries_task_sec`` and treat wall-clock as the headline only.

The same payload is also written to ``BENCH_FULL_latest.json`` next to
this script (override with $SPARK_GRAFT_BENCH_OUT; empty disables): the
driver's per-round ``BENCH_r*.json`` artifact truncates to a tail of the
stdout line, so only that file carries the complete per-query timings —
each round a copy is committed as ``BENCH_FULL_r{N}.json`` so every
query stays cross-round comparable (see SCALE.md trend table).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.session import get_spark

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))

# Canary query for box-state normalization (SCALE.md quiet-box
# protocol, r8 verdict item 2): a mid-weight certified query untouched
# since the early rounds, timed best-of-3 BEFORE the sweep. Its
# task-seconds ratio vs the committed reference value estimates the
# box-state drift baked into the whole recording — a recording whose
# canary is >1.15x its reference should be retaken, and cross-round
# medians should be read next to the two canary factors.
CANARY = "q1_pricing_summary"
CANARY_RUNS = 3


def _max_stage_id(spark) -> int:
    """Largest stage id the status store has seen (-1 when empty)."""
    return max((e[0] for e in _stage_entries(spark)), default=-1)


def _stage_entries(spark) -> list[tuple[int, int, int, int]]:
    """(stageId, attemptId, executorRunTime_ms, executorCpuTime_ms) for
    every stage attempt in the AppStatusStore. Stage ids are
    monotonically increasing, so a query run's task-time is the sum over
    ids minted after the run started — immune to the store evicting OLD
    stages mid-bench (spark.ui.retainedStages), which would corrupt a
    cumulative-total delta."""
    sc = spark.sparkContext
    jvm = sc._jvm
    ss = spark._jsparkSession.sparkContext().statusStore()
    empty = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    lst = ss.stageList(empty, False, False, quantiles, empty)
    out = []
    for i in range(lst.size()):
        s = lst.apply(i)
        out.append(
            (
                s.stageId(),
                s.attemptId(),
                s.executorRunTime(),
                s.executorCpuTime() // 1_000_000,
            )
        )
    return out


def _task_time_since(spark, min_stage_id: int) -> tuple[float, float]:
    """(task_seconds, cpu_seconds) accumulated by stages with id >
    min_stage_id. Task-seconds (executorRunTime) is the slot-seconds
    analogue but includes per-task wait (I/O, scheduling — dominant for
    tiny partitions at small SF); cpu-seconds (executorCpuTime) is the
    pure compute, the number that actually scales with data volume."""
    entries = [e for e in _stage_entries(spark) if e[0] > min_stage_id]
    return (
        sum(rt for _s, _a, rt, _c in entries) / 1000.0,
        sum(c for _s, _a, _rt, c in entries) / 1000.0,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = os.getloadavg()[0]
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")

    # Warm the session (JVM JIT, codegen cache, FS metadata) on a trivial job.
    spark.range(1000).count()

    # Canary measurement (box-state normalization; see CANARY above).
    canary_task = None
    if CANARY in Q.REGISTRY:
        best = None
        for _ in range(CANARY_RUNS):
            mark = _max_stage_id(spark)
            Q.REGISTRY[CANARY].fn(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            task, _cpu = _task_time_since(spark, mark)
            best = task if best is None else min(best, task)
        canary_task = round(best, 3)

    timings: dict[str, float] = {}
    task_secs: dict[str, float] = {}
    cpu_secs: dict[str, float] = {}
    for name, qd in Q.REGISTRY.items():
        best = None
        best_task = None
        best_cpu = None
        for _ in range(RUNS):
            mark = _max_stage_id(spark)
            t0 = time.monotonic()
            df = qd.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            task, cpu = _task_time_since(spark, mark)
            best = dt if best is None else min(best, dt)
            best_task = task if best_task is None else min(best_task, task)
            best_cpu = cpu if best_cpu is None else min(best_cpu, cpu)
        timings[name] = round(best, 3)
        task_secs[name] = round(best_task, 3)
        cpu_secs[name] = round(best_cpu, 3)

    payload = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "queries_task_sec": task_secs,
        "queries_cpu_sec": cpu_secs,
        "task_sec_total": round(sum(task_secs.values()), 3),
        "cpu_sec_total": round(sum(cpu_secs.values()), 3),
        "canary_query": CANARY,
        "canary_task_sec": canary_task,
        "load_avg_start": round(load0, 2),
        "runs": RUNS,
        "sf": sf,
    }
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_FULL_latest.json",
        ),
    )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
