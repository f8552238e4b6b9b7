"""Quiet-box BENCH_FULL recording protocol (r8 verdict item 2).

The committed BENCH_FULL_r08 carried a uniform ~20% box-state drift
(common-query median task ratio 1.21 vs the driver bench's 1.07) — the
plans were fine, the recording conditions weren't. This wrapper pins the
conditions so a committed BENCH_FULL is trustworthy without footnotes:

  1. REFUSE a busy box: 1-min load average must be < 2.0 at start
     (override with --force, recorded in the artifact either way).
  2. Drop the page cache (best-effort: /proc/sys/vm/drop_caches needs
     root; skipped silently when not permitted) so cold-read variance is
     the SAME across rounds instead of depending on what ran before.
  3. Remove scale-ladder fixtures from the scratch dir first (pass
     --scale-dir); a 0.5 GB sf3 tree sitting in the page cache is
     exactly the incident SCALE.md:1334-1341 documents.
  4. Solo run, best-of-3 per query (SPARK_GRAFT_BENCH_RUNS=3).
  5. Canary normalization: bench.py times a pinned canary query
     (q1_pricing_summary) best-of-3 before the sweep and embeds
     ``canary_task_sec``; this wrapper compares it against a ROLLING
     BAND over the last up-to-3 committed artifacts (pass several
     --prior files) and FAILS the recording when the reading falls
     outside [0.85 * min(window), 1.15 * max(window)] — re-run on a
     quieter box instead of committing a drifted artifact.

     Why a band, not a single prior (r10 verdict item 5): the gate's
     first real firing compared r10's normal-box canary against r9's —
     which the committed history showed was the outlier — so a single
     prior makes the gate hostage to whichever box state the LAST round
     recorded. The band over the last 3 committed canaries encodes the
     history mechanically: one drifted round widens the band instead of
     moving the reference, and the window self-heals as normal rounds
     land. With a single --prior the band degenerates to the old
     +-15% check.

Usage:
    python tools/bench_record.py BENCH_FULL_out.json \
        [--prior BENCH_FULL_r09.json BENCH_FULL_r10.json ...] \
        [--scale-dir /tmp/sfscale] [--force]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOAD_LIMIT = 2.0
CANARY_TOLERANCE = 0.15


def rolling_band(vals: list[float]) -> tuple[float, float, float]:
    """(lo, hi, median) of the rolling canary band: accept readings in
    [0.85 * min, 1.15 * max] of the committed window. One drifted round
    WIDENS the band instead of moving the reference; a single-value
    window degenerates to the original +-15% prior check."""
    lo = (1.0 - CANARY_TOLERANCE) * min(vals)
    hi = (1.0 + CANARY_TOLERANCE) * max(vals)
    med = sorted(vals)[len(vals) // 2]
    return lo, hi, med


def drop_page_cache() -> bool:
    try:
        subprocess.run(["sync"], check=False)
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except (PermissionError, OSError):
        return False


def main(argv: list[str] | None = None) -> int:
    # argparse (ADVICE r9 item 3): the hand-rolled split treated option
    # VALUES as positionals — '--scale-dir /tmp/x OUT.json' made
    # out_path='/tmp/x' (the directory just rmtree'd) and never wrote
    # OUT.json.
    ap = argparse.ArgumentParser(
        prog="bench_record.py",
        description="Quiet-box BENCH_FULL recording (see module docstring)",
    )
    ap.add_argument("out_path", help="output BENCH_FULL json artifact")
    ap.add_argument(
        "--prior", nargs="+", default=None,
        help="prior committed artifacts (up to 3 used) for the rolling "
             "canary band",
    )
    ap.add_argument("--scale-dir", help="scale-ladder fixture dir to remove first")
    ap.add_argument("--force", action="store_true",
                    help="record despite load/canary refusals (flagged)")
    ns = ap.parse_args(argv)
    out_path, priors, scale_dir, force = (
        ns.out_path, ns.prior or [], ns.scale_dir, ns.force
    )
    if out_path in priors:
        print("refusing: --prior and output are the same file")
        return 2

    load1 = os.getloadavg()[0]
    if load1 >= LOAD_LIMIT and not force:
        print(
            f"REFUSED: load average {load1:.2f} >= {LOAD_LIMIT} — the box "
            "is not quiet. Re-run when solo, or pass --force (recorded)."
        )
        return 1

    scale_fixtures_removed = False
    if scale_dir and os.path.isdir(scale_dir):
        print(f"removing scale fixtures: {scale_dir}")
        shutil.rmtree(scale_dir, ignore_errors=True)
        scale_fixtures_removed = True
    cache_dropped = drop_page_cache()
    print(f"page cache dropped: {cache_dropped}; load avg: {load1:.2f}")

    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_RUNS"] = "3"
    env["SPARK_GRAFT_BENCH_OUT"] = out_path
    res = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")], env=env
    )
    if res.returncode:
        return res.returncode

    with open(out_path) as f:
        payload = json.load(f)
    payload["protocol"] = {
        "quiet_box": load1 < LOAD_LIMIT,
        "load_avg_preflight": round(load1, 2),
        "page_cache_dropped": cache_dropped,
        "scale_fixtures_removed": scale_fixtures_removed,
        "runs": 3,
        "forced": force,
    }

    verdict = 0
    window: list[tuple[str, float]] = []
    for p in priors:
        if not os.path.exists(p):
            print(f"prior artifact missing, skipped: {p}")
            continue
        with open(p) as f:
            pc = json.load(f).get("canary_task_sec")
        if pc:
            window.append((p, float(pc)))
        else:
            print(f"prior artifact has no canary_task_sec (pre-r9), "
                  f"skipped: {p}")
    window = window[-3:]  # rolling: last up-to-3 committed canaries
    cc = payload.get("canary_task_sec")
    if window and cc:
        vals = [v for _, v in window]
        lo, hi, med = rolling_band(vals)
        payload["protocol"]["canary_window"] = {
            p: v for p, v in window
        }
        payload["protocol"]["canary_band"] = [round(lo, 3), round(hi, 3)]
        payload["protocol"]["canary_factor_vs_median"] = round(cc / med, 3)
        print(f"canary {cc:.3f} vs rolling band [{lo:.3f}, {hi:.3f}] "
              f"(window {vals}, median {med:.3f})")
        if not (lo <= cc <= hi) and not force:
            print(
                f"RECORDING FAILED: canary {cc:.3f} outside the rolling "
                f"band [{lo:.3f}, {hi:.3f}] — box state differs from every "
                "recent committed recording; re-run on a quieter box "
                "(artifact kept, marked canary_ok=false)."
            )
            payload["protocol"]["canary_ok"] = False
            verdict = 1
        else:
            payload["protocol"]["canary_ok"] = True

    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded: {out_path}")
    return verdict


if __name__ == "__main__":
    sys.exit(main())
