"""Round-close gate: the committed, one-command certification the next
round's judge can diff instead of re-deriving (round-4 verdict item 4).

Runs, in order:
  1. the strict (type + bit-exact value) oracle sweep over the ENTIRE
     query registry at sf0.01 (tools/compare_strict.py — not just the
     driver's 50-query window),
  2. the registry-wide plan linter (tools/plan_lint.py: no cartesians,
     every unpartitioned window bounded by an aggregate), and
  3. the full pytest suite,

then writes a one-line-per-fact summary to GATE_latest.md (override with
$SPARK_GRAFT_GATE_OUT) and prints it. Commit the file as GATE_r{N}.md at
round close; a judge diffing two rounds' gate files sees registry size,
sweep verdict, and test verdict move without rerunning anything.

Usage: python tools/round_gate.py [sf_dir]    (default /root/testdata/sf0.01)
Exit code 0 only if BOTH the sweep and pytest are fully green.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    # delay the registry import until after arg parsing (it is heavy)
    sys.path.insert(0, ROOT)
    from etl_gardener_spark.plans import queries as Q

    names = list(Q.REGISTRY)
    sweep = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "compare_strict.py"),
         sf_dir, *names],
        capture_output=True, text=True, cwd=ROOT,
    )
    sweep_tail = (sweep.stdout.strip().splitlines() or ["<no output>"])[-1]
    sweep_fails = [
        ln for ln in sweep.stdout.splitlines() if ln.startswith("FAIL")
    ]

    lint = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "plan_lint.py")],
        capture_output=True, text=True, cwd=ROOT,
    )
    lint_tail = (lint.stdout.strip().splitlines() or ["<no output>"])[-1]

    tests = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        capture_output=True, text=True, cwd=ROOT,
    )
    tests_tail = "<no output>"
    for ln in reversed(tests.stdout.strip().splitlines()):
        if re.search(r"\d+ (passed|failed|error)", ln):
            tests_tail = ln.strip()
            break

    ok = (
        sweep.returncode == 0
        and lint.returncode == 0
        and tests.returncode == 0
    )
    lines = [
        f"- gate: {'GREEN' if ok else 'RED'}",
        f"- registry: {len(names)} queries "
        f"({sum(1 for n in names if Q.REGISTRY[n].oracle)} oracle-backed)",
        f"- strict sweep @ {sf_dir}: {sweep_tail}",
        f"- plan lint: {lint_tail}",
        f"- pytest: {tests_tail}",
        f"- driver window round: {Q.DRIVER_WINDOW_ROUND} "
        f"({len(Q.DRIVER_WINDOW)} names)",
    ]
    if sweep_fails:
        lines.append(f"- sweep failures: {sweep_fails[:10]}")
    summary = "# Round gate\n\n" + "\n".join(lines) + "\n"

    out_path = os.environ.get(
        "SPARK_GRAFT_GATE_OUT", os.path.join(ROOT, "GATE_latest.md")
    )
    if out_path:
        with open(out_path, "w") as f:
            f.write(summary)
    print(summary, end="")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
