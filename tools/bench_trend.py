"""Cross-round bench comparison: prints a markdown summary comparing a
BENCH_FULL_*.json (complete per-query timings, written by bench.py) with
a prior round's artifact — either another BENCH_FULL file or a legacy
BENCH_r*.json whose `tail` field holds a (truncated) stdout line.

Usage: python tools/bench_trend.py <current.json> <prior.json> [label]

Flagging is TASK-SECONDS PRIMARY (r7 verdict item 3): executor
task-time tracks actual work, while wall-clock on a shared box swings
±15% with CPU contention and scratch-table/tmp-IO variance — r7's
window-bench wall flags (bucketed_cohort_join 1.73→4.21 s,
dq_quarantine_promotion 1.10→2.33 s) were exactly this noise class,
with task-seconds for the same queries IMPROVED. Concretely:

* a regression is reported when the task-seconds ratio exceeds 2x;
* wall-only artifacts (the driver's truncated BENCH_r*.json) are
  upgraded automatically by loading the committed sibling
  ``BENCH_FULL_r*.json`` when one exists next to them;
* when only wall is available for a pair, >2x wall movers are listed
  as "wall-only, unconfirmed" — a hint to profile, not a regression.
"""

from __future__ import annotations

import json
import os
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


def _with_full_sibling(path: str) -> str:
    """A truncated driver artifact BENCH_r{N}.json has a committed
    complete twin BENCH_FULL_r{N}.json carrying task-seconds — prefer
    it so the task-primary comparison survives artifact truncation."""
    d, base = os.path.split(path)
    m = re.fullmatch(r"BENCH_(r\d+\.json)", base)
    if not m:
        return path
    full = os.path.join(d, f"BENCH_FULL_{m.group(1)}")
    return full if os.path.exists(full) else path


def _ratio_table(cur, prior, common):
    ratios = {k: cur[k] / prior[k] for k in common}
    worst = sorted(ratios.items(), key=lambda x: -x[1])[:5]
    best = sorted(ratios.items(), key=lambda x: x[1])[:5]
    return ratios, worst, best


def main() -> None:
    cur_path, prior_path = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else prior_path
    cur_path, prior_path = _with_full_sibling(cur_path), _with_full_sibling(prior_path)
    cur_task = load_queries(cur_path, "queries_task_sec")
    prior_task = load_queries(prior_path, "queries_task_sec")
    cur_wall = load_queries(cur_path)
    prior_wall = load_queries(prior_path)
    task_mode = bool(cur_task and prior_task)
    if task_mode:
        cur, prior = cur_task, prior_task
        print("metric: executor task-seconds (noise-robust, flagging-primary)")
    else:
        cur, prior = cur_wall, prior_wall
        print(
            "metric: wall-clock seconds (task-time absent in an artifact;"
            " >2x movers are UNCONFIRMED hints, not regressions)"
        )
    common = sorted(
        k for k in cur if k in prior and prior[k] > 0.05 and cur[k] > 0
    )
    ratios, worst, best = _ratio_table(cur, prior, common)
    med = statistics.median(ratios.values())
    print(f"comparable queries vs {label}: {len(common)}")
    print(f"median ratio (current/prior): {med:.3f}")
    # canary normalization (quiet-box protocol, tools/bench_record.py):
    # when both artifacts carry the canary, report the box-state factor
    # and the median with it divided out — the number to trust when the
    # raw median and the canary move together (uniform drift).
    try:
        with open(cur_path) as f:
            cur_canary = json.load(f).get("canary_task_sec")
        with open(prior_path) as f:
            prior_canary = json.load(f).get("canary_task_sec")
    except OSError:
        cur_canary = prior_canary = None
    if cur_canary and prior_canary:
        cf = cur_canary / prior_canary
        print(f"canary factor (box state, current/prior): {cf:.3f}")
        print(f"canary-normalized median ratio: {med / cf:.3f}")
    print(f"total current: {sum(cur.values()):.1f} s over {len(cur)} queries")
    over2 = [k for k, r in ratios.items() if r > 2.0]
    if task_mode:
        print(f"regressions >2x (task-seconds): {over2 or 'none'}")
        # wall movers that task-time does NOT confirm: report as noise
        wall_common = [
            k for k in cur_wall
            if k in prior_wall and prior_wall[k] > 0.05 and cur_wall[k] > 0
        ]
        wall_only = [
            k for k in wall_common
            if cur_wall[k] / prior_wall[k] > 2.0 and k not in over2
        ]
        if wall_only:
            noted = ", ".join(
                f"{k} (wall {cur_wall[k] / prior_wall[k]:.1f}x,"
                f" task {ratios.get(k, float('nan')):.2f}x)"
                for k in sorted(wall_only)
            )
            print(f"wall-only movers (scheduler/IO jitter, NOT flagged): {noted}")
    else:
        print(f">2x wall movers (wall-only, unconfirmed): {over2 or 'none'}")
    print("\n| direction | query | prior s | current s | ratio |")
    print("|---|---|---|---|---|")
    for k, r in worst:
        print(f"| slowest-trending | {k} | {prior[k]} | {cur[k]} | {r:.2f}x |")
    for k, r in best:
        print(f"| fastest-trending | {k} | {prior[k]} | {cur[k]} | {r:.2f}x |")


if __name__ == "__main__":
    main()
