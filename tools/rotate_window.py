"""Rotate the driver certification window (plans/queries.py
DRIVER_WINDOW / DRIVER_WINDOW_ROUND) for a new round — one command
instead of a hand edit of a 50-name literal.

    python tools/rotate_window.py <round> [name ...]
    python tools/rotate_window.py <round> --age [--dry]

``--dry`` prints the would-be rotating slots (with first-time flags)
and writes nothing — preview the r8 age selection before committing
to it.

With no names, uses the embedded queue for that round (mirrors
ROTATION.md). With ``--age`` (the round-8+ endgame policy), the 38
rotating slots are computed from the committed CORRECTNESS artifacts:
the queries whose most recent GREEN driver row is oldest (never
windowed or last seen red = oldest of all), ties broken by registry
order. The tool:

  1. keeps the 12 permanent SURVEY §2 parity rows,
  2. replaces the 38 rotating slots with the given names,
  3. validates: every name registered, exactly 50 total, no duplicates,
     and the >=70%-first-timer invariant against CORRECTNESS_r{N}.json
     artifacts with N < <round> (the same rule
     tests/test_plans.py::test_driver_window_rotates_toward_uncertified
     enforces) while the uncertified pool still allows it,
  4. rewrites the DRIVER_WINDOW block in plans/queries.py.

It does NOT run the strict sweep; after rotating, run

    python tools/compare_strict.py /root/testdata/sf0.01 $(window names)

(or just tools/round_gate.py) so the new window is verified green
BEFORE the driver grades it.
"""

from __future__ import annotations

import json
import glob
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERIES_PY = os.path.join(ROOT, "etl_gardener_spark", "plans", "queries.py")

PARITY = [
    "dedup_keep_best",
    "dedup_delete_set",
    "dedup_legacy_regex_key",
    "dedup_legacy_concat_key",
    "join_annotate",
    "join_annotation_window",
    "copy_partition",
    "delete_partition",
    "upsert_partition",
    "load_jsonl",
    "load_csv",
    "read_schema_evolved",
]

# Forward queues, mirroring ROTATION.md. Keep both in sync when adding
# queries (ROTATION.md is the prose source of truth; this is the
# executable copy).
QUEUES: dict[int, list[str]] = {
    6: [
        "q7_nation_pair_volume", "q11_part_concentration",
        "q13_order_count_distribution", "q15_top_revenue_supplier",
        "q16_brand_supplier_cnt", "q17_small_quantity_part_revenue",
        "q19_disjunctive_revenue", "q22_idle_rich_segments",
        "orders_grouping_sets", "top_supplier_per_nation",
        "supplier_league_table", "lateral_top2_per_nation",
        "customers_without_big_orders", "nation_yoy_revenue_growth",
        "cohort_retention", "retention_cohorts", "revenue_cohorts",
        "purchase_gap_stats", "order_gap_percentiles_by_segment",
        "discount_band_effectiveness", "order_basket_size_distribution",
        "rolling_7d_active_users", "event_transitions", "top_event_paths",
        "dau_mau_stickiness", "session_conversion_rate",
        "session_error_counts", "ab_variant_conversion",
        "revenue_pareto", "top_percentile_orders", "ship_lag_percentiles",
        "value_outliers_by_type", "value_mad_by_type",
        "heavy_hitter_terms", "dq_benford_value",
        # the two r5 driver-red rows, re-windowed after their round-6
        # representation fixes, plus the batch twin of the streaming one
        # (never driver-certified) — displacing three first-timers
        # (user_hour_entropy, events_dow_hour_heatmap,
        # hourly_seasonal_anomalies) to round 7
        "doc_postings", "stream_sliding_rollup", "sliding_1h_15m_rollup",
    ],
    7: [
        "session_window_rollup",
        "user_hour_entropy", "events_dow_hour_heatmap",
        "hourly_seasonal_anomalies",
        "scd2_user_attribute", "snapshot_apply_roundtrip",
        "debounce_events", "error_streaks", "top_orders_with_ties",
        "weekly_mixture_drift", "event_type_affinity", "props_key_census",
        "dq_quarantine_promotion", "weekly_user_cms_rollup",
        "doc_bloom_decontaminate", "emb_pq_codes", "emb_ann_topk_pq",
        "doc_hybrid_rrf", "doc_dsir_select", "emb_ann_topk_ivfpq",
        "emb_pq_recall_report",
        # round-6 additions (registry 217 -> 224), absorbed here so the
        # never-certified pool empties this round (r6 verdict item 1)
        "doc_containment_pairs", "doc_split_leakage",
        "q21_waiting_suppliers", "q20_majority_share_suppliers",
        "q2_min_cost_supplier", "doc_repetition_signals",
        "doc_incremental_containment",
        # pool exhausted past this point: re-cert the heaviest families
        # (pair generators, graph, clustering) round-robin; the rest of
        # the r6-era re-cert list flows into the r8 age queue
        "doc_minhash_lsh_pairs", "doc_jaccard_pairs", "doc_simhash_pairs",
        "doc_winnow_pairs", "mm_phash_near_pairs", "emb_near_dup_pairs",
        "doc_dup_clusters", "doc_pagerank", "emb_kmeans",
        "emb_semantic_dedup",
    ],
}


def certified_before(round_no: int) -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) >= round_no:
            continue
        with open(path) as f:
            names.update(json.load(f).keys())
    return names


def _row_green(row: dict) -> bool:
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def last_green_round(round_no: int) -> dict[str, int]:
    """name -> most recent round (< round_no) with a GREEN driver row.
    A red row does not count — a query that failed its last window has
    age 0 and therefore sorts to the front of the age queue."""
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m or int(m.group(1)) >= round_no:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if isinstance(row, dict) and _row_green(row):
                last[name] = max(last.get(name, 0), rnd)
    return last


def age_queue(round_no: int, registry: list[str]) -> list[str]:
    """The round-8+ freshness selection (ROTATION.md): rank non-parity
    queries by the round of their most recent GREEN driver row (never /
    red = round 0, i.e. oldest), ties broken by registry order, and take
    the 38 oldest. New queries and driver-red rows jump the queue by
    construction."""
    last = last_green_round(round_no)
    candidates = [n for n in registry if n not in PARITY]
    ranked = sorted(
        range(len(candidates)),
        key=lambda i: (last.get(candidates[i], 0), i),
    )
    return [candidates[i] for i in ranked[:38]]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    use_age = "--age" in sys.argv
    dry = "--dry" in sys.argv
    argv = [a for a in sys.argv[1:] if a not in ("--age", "--dry")]
    if not argv or not argv[0].lstrip("-").isdigit():
        print(__doc__)
        return 2
    round_no = int(argv[0])
    if use_age and argv[1:]:
        print("--age computes the slots itself; explicit names "
              f"{argv[1:]} would be ignored — pass one or the other")
        return 2

    sys.path.insert(0, ROOT)
    from etl_gardener_spark.plans import queries as QmodEarly

    if use_age:
        rotating = age_queue(round_no, list(QmodEarly.REGISTRY))
    else:
        rotating = argv[1:] or QUEUES.get(round_no, [])
    if len(rotating) != 38:
        print(f"need exactly 38 rotating names, got {len(rotating)}")
        return 2

    sys.path.insert(0, ROOT)
    from etl_gardener_spark.plans import queries as Q

    window = PARITY + rotating
    unknown = [n for n in window if n not in Q.REGISTRY]
    if unknown:
        print(f"not in registry: {unknown}")
        return 2
    if len(set(window)) != 50:
        print("window has duplicates")
        return 2

    certified = certified_before(round_no)
    pool = [
        n for n in Q.REGISTRY
        if n not in certified and n not in PARITY
    ]
    quota = int(0.7 * 38)
    fresh = [n for n in rotating if n not in certified]
    if len(pool) >= quota and len(fresh) < quota:
        print(
            f"only {len(fresh)}/38 rotating slots are first-timers "
            f"(need >= {quota}; uncertified pool is {len(pool)}); stale: "
            f"{[n for n in rotating if n in certified]}"
        )
        return 2

    if dry:
        certified_note = sum(1 for n in rotating if n in certified)
        print(f"DRY RUN — would rotate to round {round_no}:")
        print(f"  rotating ({len(rotating)}; {len(fresh)} first-timers,"
              f" {certified_note} re-certs):")
        for n in rotating:
            print(f"    {n}{'' if n in certified else '  [first-time]'}")
        return 0

    with open(QUERIES_PY) as f:
        src = f.read()
    block = (
        f"DRIVER_WINDOW_ROUND = {round_no}\n"
        "DRIVER_WINDOW: list[str] = [\n"
        "    # §2.1/2.2 parity (T1-T5 + schema evolution + rollup maintenance)\n"
        "    # — permanent, never rotates\n"
        + "".join(f'    "{n}",\n' for n in PARITY)
        + f"    # round-{round_no} rotating slots "
        f"({len(fresh)}/38 first-timers; tools/rotate_window.py)\n"
        + "".join(f'    "{n}",\n' for n in rotating)
        + "]"
    )
    pattern = re.compile(
        r"DRIVER_WINDOW_ROUND = \d+\nDRIVER_WINDOW: list\[str\] = \[.*?\n\]",
        re.S,
    )
    if not pattern.search(src):
        print("DRIVER_WINDOW block not found in plans/queries.py")
        return 2
    with open(QUERIES_PY, "w") as f:
        f.write(pattern.sub(lambda _: block, src, count=1))
    print(
        f"rotated to round {round_no}: 12 parity + {len(rotating)} rotating "
        f"({len(fresh)} first-timers). Now run tools/round_gate.py (or "
        f"compare_strict on the window) before the driver grades it, and "
        f"update ROTATION.md."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
