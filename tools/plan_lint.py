"""Registry-wide plan linter: build every registered query at a small
SF and audit its OPTIMIZED plan for the scale-killer shapes the
per-query gates in tests/test_plans.py pin individually:

  1. ``CartesianProduct`` — an unconditioned join that materializes
     |left| x |right|; never acceptable.
  2. An unpartitioned ``Window`` whose input is NOT bounded by an
     Aggregate below it — one task would sort the whole relation.
  3. ``BroadcastNestedLoopJoin`` whose broadcast side is not a
     provably-tiny relation (single-row aggregate / small literal
     relation) — reported for manual audit rather than hard-failed.
     The round-5 audit of all 26 reported sites found every build side
     bounded by construction: 1-row global aggregates (corpus stats /
     counts / scale factors: the mixture, tfidf, bm25, benford, decile,
     census, q11/q22 family), k-row centroid tables (emb_kmeans,
     emb_cluster_balance), a bounded minute spine (minute_gapfill),
     and the documented brute-force ANN baselines whose build side is
     the sampled query set (emb_ann_topk and the knn/negative-sample
     reports — the corpus-scale path is the LSH/IVF variants).
     Four more sites joined the same audited class late in round 5:
     emb_pq_codes / emb_ann_topk_pq (k_sub-row seeded PQ codebook and
     the m x k_sub query distance table, both broadcast by construction),
     doc_hybrid_rrf (the BM25 one-row corpus-stats cross join it
     inherits from doc_bm25_search), and doc_dsir_select (the one-row
     token-total and candidate-count aggregates crossed into the
     n_buckets-row weight table).

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


def main() -> int:
    names = sys.argv[1:] or list(Q.REGISTRY)
    spark = get_spark()
    hard: list[str] = []
    soft: list[str] = []
    skipped: list[str] = []
    for name in names:
        try:
            df = Q.REGISTRY[name].fn(spark, SF_DIR)
            qe = df._jdf.queryExecution()
            opt = qe.optimizedPlan()
            phys = qe.executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - report, don't abort the sweep
            hard.append(f"{name}: failed to plan: {e}")
            continue
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
    print(f"linted {len(names)} queries at {SF_DIR}")
    print(f"  local-result (plan ran in body, not audited here): {len(skipped)}")
    if soft:
        print(f"  BroadcastNestedLoopJoin present ({len(soft)}, audit list):")
        for n in sorted(soft):
            print(f"    - {n}")
    if hard:
        print("HARD VIOLATIONS:")
        for h in hard:
            print(f"  !! {h}")
        return 1
    print("no hard violations (no cartesians, every global window bounded)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
