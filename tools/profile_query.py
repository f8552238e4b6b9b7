"""Per-query cost breakdown: driver-side plan construction vs executor
work, plus the Spark job count a single run schedules.

For each named query (or --top N from a bench JSON) this reports:

    build_s   wall spent inside ``fn(spark, sf_dir)`` — pure driver-side
              Python + plan construction; any eager action inside the
              query body (count/collect/localCheckpoint(eager)) lands
              here too.
    exec_s    wall of the final noop write.
    task_s    executorRunTime summed over stages minted by the run.
    cpu_s     executorCpuTime ditto.
    jobs      Spark jobs scheduled by the run (actions; each pays
              scheduler+planning latency serially unless overlapped).

Usage: python tools/profile_query.py name [name ...] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.session import get_spark


def _store(spark):
    return spark._jsparkSession.sparkContext().statusStore()


def _max_stage_id(spark) -> int:
    ss = _store(spark)
    sc = spark.sparkContext
    jvm = sc._jvm
    empty = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    lst = ss.stageList(empty, False, False, quantiles, empty)
    return max((lst.apply(i).stageId() for i in range(lst.size())), default=-1)


def _stats_since(spark, min_stage: int, min_job: int):
    ss = _store(spark)
    sc = spark.sparkContext
    jvm = sc._jvm
    empty = jvm.java.util.ArrayList()
    quantiles = sc._gateway.new_array(jvm.double, 0)
    lst = ss.stageList(empty, False, False, quantiles, empty)
    task = cpu = 0
    nstages = 0
    for i in range(lst.size()):
        s = lst.apply(i)
        if s.stageId() > min_stage:
            task += s.executorRunTime()
            cpu += s.executorCpuTime() // 1_000_000
            nstages += 1
    jl = ss.jobsList(None)
    njobs = sum(1 for i in range(jl.size()) if jl.apply(i).jobId() > min_job)
    return task / 1000.0, cpu / 1000.0, nstages, njobs


def _max_job_id(spark) -> int:
    ss = _store(spark)
    jl = ss.jobsList(None)
    return max((jl.apply(i).jobId() for i in range(jl.size())), default=-1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--bench", default="/root/repo/BENCH_FULL_r10.json")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    names = list(args.names)
    if args.top:
        b = json.load(open(args.bench))
        ranked = sorted(b["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[: args.top] if n not in names]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile")
    spark.range(1000).count()

    print(
        f"{'query':45s} {'build_s':>8s} {'exec_s':>8s} {'task_s':>8s}"
        f" {'cpu_s':>8s} {'stages':>7s} {'jobs':>5s}"
    )
    for name in names:
        if name not in Q.REGISTRY:
            print(f"{name:45s}  -- not in registry --")
            continue
        best = None
        for _ in range(args.runs):
            mark_s = _max_stage_id(spark)
            mark_j = _max_job_id(spark)
            t0 = time.monotonic()
            df = Q.REGISTRY[name].fn(spark, sf_dir)
            t1 = time.monotonic()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.monotonic()
            task, cpu, nstages, njobs = _stats_since(spark, mark_s, mark_j)
            row = (t1 - t0, t2 - t1, task, cpu, nstages, njobs)
            if best is None or (row[0] + row[1]) < (best[0] + best[1]):
                best = row
        b, e, task, cpu, nstages, njobs = best
        print(
            f"{name:45s} {b:8.2f} {e:8.2f} {task:8.2f} {cpu:8.2f}"
            f" {nstages:7d} {njobs:5d}"
        )


if __name__ == "__main__":
    main()
