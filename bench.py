"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": 0.1}

Each query executes end-to-end into the ``noop`` sink (full plan runs on
executors; no driver-side collect skewing the measurement). Best of two runs
per query — the first run at process start pays JVM/codegen warmup that a
long-lived service never sees.

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

RUNS = 2


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark(app_name="bench")

    # Warm the session (JVM JIT, codegen cache, FS metadata) on a trivial job.
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name, qd in Q.REGISTRY.items():
        best = None
        for _ in range(RUNS):
            t0 = time.monotonic()
            df = qd.fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    payload = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
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
