"""Registry-wide plan linter: build every registered query at a small
SF and audit its OPTIMIZED plan for the scale-killer shapes the
per-query gates in tests/test_plans.py pin individually:

  1. ``CartesianProduct`` — an unconditioned join that materializes
     |left| x |right|; never acceptable.
  2. An unpartitioned ``Window`` whose input is NOT bounded by an
     Aggregate below it — one task would sort the whole relation.
  3. ``BroadcastNestedLoopJoin`` build sides — STRUCTURAL rule (round-6
     verdict item 7, promoting the round-5 docstring audit to a gate):
     every BNLJ's build subtree must contain a bounding node — an
     aggregate (1-row / k-group relations: corpus stats, counts, scale
     factors, centroid tables), a limit / TakeOrderedAndProject (sampled
     ANN query sets), a LocalTableScan (seeded codebooks via
     createDataFrame), a Sample, or a ReusedExchange whose original is
     audited under the same plan. A BNLJ whose build side is an
     unbounded scan is a hard violation — it would materialize
     |probe| x |build| at corpus scale. The round-5 manual audit of all
     26 sites (mixture, tfidf, bm25, benford, decile, census, q11/q22
     one-row aggregates; emb_kmeans/emb_cluster_balance centroids;
     minute_gapfill spine; brute-force ANN baselines on sampled query
     sets; PQ codebooks; RRF corpus stats; DSIR weight tables) is what
     this rule now checks mechanically on every run.
  4. Output contract (round-6 verdict item 2 — both r5 driver failures
     were representation bugs this rule class catches):
       (a) no Array/Map/Struct TOP-LEVEL output column (harness
           canonicalizers sort frames through pandas and cannot hash
           list cells — r5 ``doc_postings``);
       (b) no bare DECIMAL output column (the two engines may render
           scale differently; display through the exact integer kernel
           as DOUBLE instead);
       (c) source rule, checked over plans/ + streaming/ and every
           registered oracle: no ``F.round(F.sum(`` / ``ROUND(SUM(``
           money display (the double->DECIMAL cast + decimal ROUND
           midpoint hazard — r5 ``stream_sliding_rollup``); route
           through functions/exact.py.

Queries whose result is a harness-necessitated local materialization
(``createDataFrame(collect)``) present a LocalTableScan; the linter
then audits nothing for them — their heavy plan ran inside the query
body and is covered by the strict sweep + their own gates.

Usage: python tools/plan_lint.py [names...]   (default: full registry)
Writes a summary to stdout; exit 1 if any hard violation is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")

# Unpartitioned windows audited and documented as bounded-input safe
# (see tests/test_plans.py boundedness gates and the queries' own
# docstrings). Every name here must ALSO satisfy "Aggregate below" --
# the allowlist only exempts queries whose bounded input is established
# by construction other than a Catalyst Aggregate node (e.g. a
# LocalRelation or an already-collected store).
GLOBAL_WINDOW_ALLOW: set[str] = set()


def _walk(node, fn):
    fn(node)
    for i in range(node.children().length()):
        _walk(node.children().apply(i), fn)


def unpartitioned_windows_without_agg(jplan) -> int:
    """Count Window nodes with empty partitionSpec lacking an Aggregate
    anywhere below them (same walk as tests/test_plans.py)."""
    bad = 0

    def has_agg_below(node) -> bool:
        found = [False]

        def mark(n):
            if n.getClass().getSimpleName() in ("Aggregate",):
                found[0] = True

        for i in range(node.children().length()):
            _walk(node.children().apply(i), mark)
        return found[0]

    def visit(node):
        nonlocal bad
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not has_agg_below(node)
        ):
            bad += 1

    _walk(jplan, visit)
    return bad


# Physical node simple-name substrings that bound a BNLJ build side.
_BNLJ_BOUNDED = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "LocalTableScan",
    "TakeOrderedAndProject",
    "GlobalLimit",
    "LocalLimit",
    "CollectLimit",
    "Sample",
)


def unbounded_bnlj_builds(jphys) -> list[str]:
    """Structural BNLJ rule: for every BroadcastNestedLoopJoinExec,
    the BUILD child's subtree must contain a bounding node
    (_BNLJ_BOUNDED). A ReusedExchangeExec is NOT itself bounding: it is
    a leaf whose ``child()`` points at the original exchange, so the
    check recurses into that original's subtree — an unbounded
    broadcast that happens to be reused fails the gate like any other.
    Returns one description per violating node."""
    bad: list[str] = []

    def visit(node):
        if node.getClass().getSimpleName() != "BroadcastNestedLoopJoinExec":
            return
        side = node.buildSide().toString()
        child = node.children().apply(0 if side == "BuildLeft" else 1)
        found = [False]

        def mark(n):
            cls = n.getClass().getSimpleName()
            if "ReusedExchange" in cls:
                # resolve to the reused original and keep scanning there
                _walk(n.child(), mark)
                return
            if any(b in cls for b in _BNLJ_BOUNDED):
                found[0] = True

        _walk(child, mark)
        if not found[0]:
            bad.append(f"BNLJ build side ({side}) has no bounding node")

    _walk(jphys, visit)
    return bad


def output_contract_violations(df) -> list[str]:
    """Top-level output-schema rules (4a/4b in the module docstring):
    scalar columns only, no bare DECIMAL."""
    from pyspark.sql import types as T

    bad: list[str] = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            bad.append(
                f"non-scalar output column `{f.name}` "
                f"({f.dataType.simpleString()}) — harness canonicalizers "
                "cannot hash it; fold to a scalar (array_join / explode)"
            )
        if isinstance(f.dataType, T.DecimalType):
            bad.append(
                f"bare DECIMAL output column `{f.name}` "
                f"({f.dataType.simpleString()}) — display through the "
                "exact integer kernel as DOUBLE"
            )
    return bad


def source_rule_violations() -> list[str]:
    """Rule 4c: no ROUND(SUM(...)) money display anywhere in plans/,
    streaming/, or any registered oracle SQL string."""
    import glob
    import re

    bad: list[str] = []
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pat = re.compile(r"F\.round\(\s*F\.sum\(|ROUND\(\s*SUM\(", re.IGNORECASE)
    files = sorted(
        glob.glob(os.path.join(root, "etl_gardener_spark", "plans", "*.py"))
        + glob.glob(os.path.join(root, "etl_gardener_spark", "streaming", "*.py"))
    )
    for path in files:
        for i, line in enumerate(open(path), 1):
            if pat.search(line):
                rel = os.path.relpath(path, root)
                bad.append(f"{rel}:{i}: ROUND(SUM()) display: {line.strip()[:80]}")
    for name, entry in Q.REGISTRY.items():
        sql = entry.oracle or ""
        if pat.search(sql):
            bad.append(f"oracle[{name}]: ROUND(SUM()) display in oracle SQL")
    return bad


def main() -> int:
    names = sys.argv[1:] or list(Q.REGISTRY)
    spark = get_spark()
    hard: list[str] = []
    soft: list[str] = []
    skipped: list[str] = []
    hard.extend(source_rule_violations())
    for name in names:
        try:
            df = Q.REGISTRY[name].fn(spark, SF_DIR)
            qe = df._jdf.queryExecution()
            opt = qe.optimizedPlan()
            jphys = qe.executedPlan()
            phys = jphys.toString()
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            hard.append(f"{name}: failed to plan: {e}")
            continue
        # the output contract applies to EVERY query, local-result or not
        for v in output_contract_violations(df):
            hard.append(f"{name}: {v}")
        if "LocalTableScan" in phys and "Scan parquet" not in phys:
            skipped.append(name)
            continue
        if "CartesianProduct" in phys:
            hard.append(f"{name}: CartesianProduct in physical plan")
        nbad = unpartitioned_windows_without_agg(opt)
        if nbad and name not in GLOBAL_WINDOW_ALLOW:
            hard.append(
                f"{name}: {nbad} unpartitioned Window(s) without a "
                f"bounding Aggregate below"
            )
        if "BroadcastNestedLoopJoin" in phys:
            soft.append(name)
            for v in unbounded_bnlj_builds(jphys):
                hard.append(f"{name}: {v}")
    print(f"linted {len(names)} queries at {SF_DIR}")
    print(f"  local-result (plan ran in body, output contract still checked):"
          f" {len(skipped)}")
    if soft:
        print(
            f"  BroadcastNestedLoopJoin present ({len(soft)};"
            " all build sides structurally bounded):"
        )
        for n in sorted(soft):
            print(f"    - {n}")
    if hard:
        print("HARD VIOLATIONS:")
        for h in hard:
            print(f"  !! {h}")
        return 1
    print(
        "no hard violations (no cartesians, every global window bounded,"
        " every BNLJ build side bounded, scalar non-decimal outputs,"
        " no ROUND(SUM()) displays)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
