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
     ``canary_task_sec``; this wrapper compares it against the prior
     round's committed value and FAILS the recording when the factor is
     outside +-15% — re-run on a quieter box instead of committing a
     drifted artifact.

Usage:
    python tools/bench_record.py BENCH_FULL_out.json \
        [--prior BENCH_FULL_r08.json] [--scale-dir /tmp/sfscale] [--force]
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
    ap.add_argument("--prior", help="prior round's artifact for the canary gate")
    ap.add_argument("--scale-dir", help="scale-ladder fixture dir to remove first")
    ap.add_argument("--force", action="store_true",
                    help="record despite load/canary refusals (flagged)")
    ns = ap.parse_args(argv)
    out_path, prior, scale_dir, force = (
        ns.out_path, ns.prior, ns.scale_dir, ns.force
    )
    if prior and prior == out_path:
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
    if prior and os.path.exists(prior):
        with open(prior) as f:
            prior_payload = json.load(f)
        pc = prior_payload.get("canary_task_sec")
        cc = payload.get("canary_task_sec")
        if pc and cc:
            factor = cc / pc
            payload["protocol"]["canary_factor_vs_prior"] = round(factor, 3)
            print(f"canary factor vs {prior}: {factor:.3f}")
            if abs(factor - 1.0) > CANARY_TOLERANCE and not force:
                print(
                    f"RECORDING FAILED: canary drift {factor:.3f} outside "
                    f"+-{CANARY_TOLERANCE:.0%} — box state differs from the "
                    "prior recording; re-run on a quieter box (artifact "
                    "kept, marked canary_ok=false)."
                )
                payload["protocol"]["canary_ok"] = False
                verdict = 1
            else:
                payload["protocol"]["canary_ok"] = True
        else:
            print("prior artifact has no canary_task_sec (pre-r9) — factor "
                  "unavailable; first protocol recording establishes it")

    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"recorded: {out_path}")
    return verdict


if __name__ == "__main__":
    sys.exit(main())
