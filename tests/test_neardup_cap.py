"""max_bucket star-cap for banded LSH candidates (r11, the skew-ladder
lever): a hot bucket emits O(occupancy) star pairs instead of
O(occupancy²), connectivity is preserved, and small buckets keep exact
pair semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gardener_spark.operators import neardup as ND


def _components(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups = {}
    for x in list(parent):
        groups.setdefault(find(x), set()).add(x)
    return {frozenset(g) for g in groups.values()}


def test_max_bucket_star_cap(spark):
    template = " ".join(f"boiler{i} plate{i} footer{i}" for i in range(14))
    rows = []
    for i in range(40):  # hot clique: 40 near-identical docs
        rows.append((i, template + f" u{i} v{i}"))
    rows += [
        (100, "completely different text about spark adaptive execution"),
        (101, "completely different text about spark adaptive executions"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = ND.shingle_hash_sets(df, "text", "doc_id", 3).localCheckpoint()
    staged = sh.select(
        "doc_id",
        F.transform(F.col("sh"), lambda h: h % F.lit(ND._H32_MOD)).alias(
            "h32"
        ),
    )
    sig_cols = []
    for i in range(12):
        a, b = ND.perm_consts(i)
        sig_cols.append(
            F.array_min(F.transform(F.col("h32"), ND._perm_fn(a, b))).alias(
                f"sig_{i}"
            )
        )
    sig = staged.select("doc_id", *sig_cols).localCheckpoint()

    exact = {
        (r.id_a, r.id_b)
        for r in ND.minhash_lsh_candidates(sig, "doc_id", 12, 4).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in ND.minhash_lsh_candidates(
            sig, "doc_id", 12, 4, max_bucket=10
        ).collect()
    }
    # the clique's exact candidates are quadratic; the cap bounds them
    # near-linearly while the small bucket (100, 101) is untouched
    assert len(exact) > 40 * 10
    assert len(capped) < 3 * 40
    assert (100, 101) in exact and (100, 101) in capped
    # star pairs are a subset of the exact pairs, connectivity preserved
    assert capped <= exact
    assert _components(capped) == _components(exact)
    # cap larger than every bucket: exact semantics unchanged
    assert {
        (r.id_a, r.id_b)
        for r in ND.minhash_lsh_candidates(
            sig, "doc_id", 12, 4, max_bucket=10_000
        ).collect()
    } == exact
