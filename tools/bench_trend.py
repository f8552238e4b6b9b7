"""Cross-round bench comparison: prints a markdown summary comparing a
BENCH_FULL_*.json (complete per-query timings, written by bench.py) with
a prior round's artifact — either another BENCH_FULL file or a legacy
BENCH_r*.json whose `tail` field holds a (truncated) stdout line.

Usage: python tools/bench_trend.py <current.json> <prior.json> [label]

When BOTH artifacts carry ``queries_task_sec`` (bench.py records executor
task-time per query from round 5 on), the comparison uses task-time —
scheduler-noise-robust, unlike wall-clock which swings ±15% on a shared
box — and prints which metric it used. Wall-only artifacts fall back to
wall-clock.
"""

from __future__ import annotations

import json
import re
import statistics
import sys


def load_queries(path: str, key: str = "queries") -> dict[str, float]:
    with open(path) as f:
        data = json.load(f)
    if key in data:
        return {k: float(v) for k, v in data[key].items()}
    if key != "queries":
        return {}
    if "queries" in data:
        return {k: float(v) for k, v in data["queries"].items()}
    tail = data.get("tail", "")
    pairs = re.findall(r'"([a-z0-9_]+)": ([0-9.]+)', tail)
    out = {k: float(v) for k, v in pairs}
    out.pop("value", None)
    out.pop("sf", None)
    return out


def main() -> None:
    cur_path, prior_path = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else prior_path
    cur_task = load_queries(cur_path, "queries_task_sec")
    prior_task = load_queries(prior_path, "queries_task_sec")
    if cur_task and prior_task:
        cur, prior = cur_task, prior_task
        print("metric: executor task-seconds (noise-robust)")
    else:
        cur, prior = load_queries(cur_path), load_queries(prior_path)
        print("metric: wall-clock seconds (task-time absent in an artifact)")
    common = sorted(
        k for k in cur if k in prior and prior[k] > 0.05 and cur[k] > 0
    )
    ratios = {k: cur[k] / prior[k] for k in common}
    med = statistics.median(ratios.values())
    worst = sorted(ratios.items(), key=lambda x: -x[1])[:5]
    best = sorted(ratios.items(), key=lambda x: x[1])[:5]
    print(f"comparable queries vs {label}: {len(common)}")
    print(f"median ratio (current/prior): {med:.3f}")
    print(f"total current: {sum(cur.values()):.1f} s over {len(cur)} queries")
    over2 = [k for k, r in ratios.items() if r > 2.0]
    print(f"regressions >2x: {over2 or 'none'}")
    print("\n| direction | query | prior s | current s | ratio |")
    print("|---|---|---|---|---|")
    for k, r in worst:
        print(f"| slowest-trending | {k} | {prior[k]} | {cur[k]} | {r:.2f}x |")
    for k, r in best:
        print(f"| fastest-trending | {k} | {prior[k]} | {cur[k]} | {r:.2f}x |")


if __name__ == "__main__":
    main()
