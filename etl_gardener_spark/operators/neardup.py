"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard. The LLM-training-data dedup family, built Spark-first.

Design constraints at 100 TB:

* **Never O(n²).** All-pairs similarity over billions of docs is off the
  table. Every near-dup operator here reduces to equi-joins on computed
  keys (shingle, LSH band bucket, SimHash band) so Spark executes them as
  shuffle joins with map-side combine — the candidate set, not the corpus,
  is quadratic (and only within buckets).
* **Deterministic hashing.** All hashes derive from md5 of content —
  stable across runs, partitions, engines (so the DuckDB oracles can
  reproduce results bit-for-bit, and reruns of an idempotent pipeline
  stage agree).
* **No Python in the hot path.** Shingling, hashing, min-reduction, band
  keys: all Catalyst expressions over arrays (higher-order functions).

MinHash here hashes each shingle ONCE — md5, folded to a 60-bit integer —
and derives every signature slot by an integer universal-hash permutation
``(a_i * h32 + b_i) mod p`` over that base hash (the classic
one-hash-k-permutations construction). That's 1 md5 per shingle instead
of k, and the permutations are pure 64-bit arithmetic inside codegen; the
a_i/b_i constants are themselves md5-derived, so signatures stay
deterministic and engine-portable (DuckDB mirrors the fold and the
arithmetic exactly).

The reference has no near-dup operators (its dedup is exact-key windowed
keep-best, cloud/bq/ops.go:184-218); this module is the north-star
extension layered on the same shuffle/join core (SURVEY.md §7).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_gardener_spark.functions.text import (
    fingerprint_md5,
    shingles_of,
    ws_tokens,
)

# Minimum scan parallelism for the shingle kernel (shingle_sets): a
# small corpus arriving as 1 parquet split would otherwise run the whole
# tokenize+shingle+md5 codegen pipeline on one core. 8 is the measured
# sweet spot for these nested-lambda trees (r10 remeasurement with
# stage-level executorRunTime, sf0.1 containment: width 1 -> wall 7.05 s
# / task 12.3 s; width 8 -> wall 1.48 s / task 3.9 s; width 32 -> task
# 14.1 s — the r8 partition-floor per-task setup cost is real but only
# bites past ~16 concurrent tasks, see SCALE.md r10 revision).
_SHINGLE_FLOOR = 8

# Universal-hash modulus for MinHash permutations: smallest prime > 2^32.
# a*h32+b < 2^28 * 2^32 ≈ 2^60 stays well inside int64 in every engine.
MINHASH_PRIME = 4294967311
_H32_MOD = 4294967296  # fold the 60-bit shingle hash to 32 bits first


def _perm_fn(a: int, b: int):
    """One-arg lambda factory (a bound via closure — extra lambda params
    would be misread as Spark's (value, index) higher-order signature)."""
    return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)


def perm_consts(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for MinHash permutation i — md5-derived
    28-bit constants (no RNG: reruns and oracles agree bit-for-bit)."""
    a = int(hashlib.md5(f"minhash-a-{i}".encode()).hexdigest()[:7], 16) | 1
    b = int(hashlib.md5(f"minhash-b-{i}".encode()).hexdigest()[:7], 16)
    return a, b


def shingle_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, sh) with sh = distinct word n-gram shingles.

    Plan discipline, in order:
    1. stage the token array in its own projection (computed once per row,
       then indexed as an attribute — not re-split per element_at; 35x,
       see functions/text.shingles_of);
    2. filter on the CHEAP predicate ``size(tokens) >= n`` *before* the
       shingle projection. Filtering on ``size(sh) > 0`` after it is
       equivalent but catastrophic: Catalyst pushes the predicate below
       the project, so the whole shingle expression is evaluated twice
       per row (once for the filter, once for the output) — measured 4x
       on real documents.
    """
    if df.rdd.getNumPartitions() < _SHINGLE_FLOOR:
        df = df.repartition(_SHINGLE_FLOOR)
    t1 = df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
    return t1.filter(F.size("__toks") >= n).select(
        F.col(id_col),
        F.array_distinct(shingles_of(F.col("__toks"), n)).alias("sh"),
    )


def shingle_hash_sets(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """(id, sh) with sh = distinct 60-bit integer shingle hashes.

    Each distinct shingle is hashed once — md5, first 15 hex chars folded
    to an int64 (< 2^60) — and all downstream near-dup math (MinHash
    permutations, Jaccard intersections, inverted-index joins) runs on
    8-byte ints instead of ~20-byte strings: one md5 per shingle total,
    cheaper shuffles, codegen'd comparisons. DuckDB mirror of the fold:
    list_reduce over md5 hex chars, (x, y) -> x*16+y.

    The md5 pass is the CPU floor of the whole dedup family.
    shingle_sets round-robins an under-partitioned scan up to
    ``_SHINGLE_FLOOR`` (8) partitions before this kernel: the r8
    partition-floor experiment rejected spreading outright, but its
    task-seconds were read from the broken executor-uptime metric
    (SCALE.md r10 "task-seconds metric" note); remeasured with
    stage-level executorRunTime, an 8-way floor improves BOTH wall
    (7.05 -> 1.48 s, sf0.1 containment) and task-seconds (12.3 -> 3.9)
    — the per-task lambda setup cost r8 observed is real but only
    dominates past ~16 concurrent tasks (width 32: task 14.1 s).
    Warehouse-scale inputs arrive in many splits and skip the shuffle.
    """
    sh = shingle_sets(df, text_col, id_col, n)
    h = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    return sh.select(
        F.col(id_col),
        F.array_distinct(F.transform(F.col("sh"), h)).alias("sh"),
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Group documents by content fingerprint (md5 of normalized text).

    Output: one row per duplicate *group* (fingerprint, n_copies, keep_id =
    smallest id — the deterministic survivor). groupBy is a single shuffle
    on the 16-byte fingerprint with map-side partial aggregation.
    """
    return (
        df.select(fingerprint_md5(text_col).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep exactly one document (smallest id) per content fingerprint.

    Same shape as the reference's keep-best window dedup with the
    fingerprint as partition key and the id as priority order — one
    shuffle, survivors only.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(fingerprint_md5(text_col)).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    n: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """(id, sig_0..sig_{k-1}) int64 MinHash signature over distinct word
    n-grams, one-hash-k-permutations construction.

    Each shingle is hashed once (shingle_hash_sets); slot i is
    ``min over shingles of (a_i * h32 + b_i) mod MINHASH_PRIME`` — pure
    integer arithmetic over a staged attribute, so the whole signature
    costs |shingles| md5 calls + 12·|shingles| multiplies per document
    (the previous per-slot-md5 construction cost 12·|shingles| md5s).

    ``materialize=True`` (default) eagerly localCheckpoints the signature
    relation — a narrow (id + k int64) table, ~100 bytes/doc — so the
    downstream LSH **self-join reads it twice instead of recomputing the
    hash pipeline twice**. This is the standard materialization barrier
    before self-joins; at corpus scale it also truncates the plan so AQE
    sizes the join from real statistics.

    Documents with fewer than ``n`` tokens have no shingles and are dropped
    (nothing to match on).
    """
    staged = shingle_hash_sets(df, text_col, id_col, n).select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda h: h % F.lit(_H32_MOD)).alias("h32"),
    )
    sig_cols = []
    for i in range(num_hashes):
        a, b = perm_consts(i)
        sig_cols.append(
            F.array_min(
                F.transform(F.col("h32"), _perm_fn(a, b))
            ).alias(f"sig_{i}")
        )
    out = staged.select(id_col, *sig_cols)
    if materialize:
        out = out.localCheckpoint(eager=True)
    return out


def exploded_bands(
    sig: DataFrame, id_col: str, num_hashes: int, bands: int
) -> DataFrame:
    """(id, band, band_key) — one row per document per LSH band, with
    band_key = md5 of the band's concatenated signature slots. This is
    the equi-join key relation every LSH consumer (self-join pair
    finding, incremental store probing) joins on; at warehouse scale the
    persisted store keeps exactly this shape, bucketed by (band,
    band_key), so a probe join is co-located and touches only matching
    buckets."""
    rows = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"sig_{b * rows + r}").cast("string")
                            for r in range(rows)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.select(F.col(id_col), F.explode(band_structs).alias("bk"))
        .select(id_col, "bk.band", "bk.band_key")
    )


def minhash_lsh_candidates(
    sig: DataFrame,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs via banded LSH: split the k-slot signature into
    ``bands`` bands of k/bands rows; docs agreeing on ALL rows of any band
    become a candidate pair.

    Plan shape: explode to (id, band, band_key) — band_key = md5 of the
    band's concatenated slots — then self-equi-join on (band, band_key)
    with id< id to orient pairs, then distinct. The join key is a hash
    bucket, so work scales with bucket occupancy, never corpus².

    ``max_bucket`` (default None = exact semantics): buckets above the
    cap emit STAR pairs only — every member paired with the bucket's
    min-id hub — instead of all pairs, bounding a hot bucket's output at
    O(occupancy) instead of O(occupancy²). The skew ladder (SCALE.md
    r11) showed AQE absorbs the hot bucket's SHUFFLE fine; the cap is
    the lever for the remaining quadratic OUTPUT, which a boilerplate
    clique produces by construction. Semantics trade-off, stated
    plainly: within a capped bucket the star preserves CONNECTIVITY
    (doc_dup_clusters' connected components are unchanged when the
    bucket is a true near-dup clique — exactly the corpus shape that
    creates hot buckets), but a downstream pairwise verify sees only
    hub-spoke pairs, so spoke-spoke pairs whose only collision was the
    capped bucket are not emitted. Production near-dup systems cap
    candidates the same way; keep None where exact pair enumeration is
    the contract (every registry oracle pins None).
    """
    exploded = exploded_bands(sig, id_col, num_hashes, bands)
    if max_bucket is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_key")
        exploded = exploded.select(
            id_col, "band", "band_key",
            F.count(F.lit(1)).over(w).alias("__occ"),
            F.min(id_col).over(w).alias("__hub"),
        )
    a = exploded.alias("a")
    b = exploded.alias("b")
    cond = (
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_key") == F.col("b.band_key"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    )
    if max_bucket is not None:
        cond = cond & (
            (F.col("a.__occ") <= F.lit(max_bucket))
            | (F.col(f"a.{id_col}") == F.col("a.__hub"))
        )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_auto_params(
    n_docs: int, threshold: float, max_hashes: int = 144
) -> tuple[int, int]:
    """Deterministic (num_hashes, bands) keyed on CORPUS SIZE and the
    Jaccard threshold — the self-correcting answer to banding-collision
    onset (SCALE.md sf3 ladder, α=1.36 at fixed tuning).

    Rows-per-band bounds the spurious-collision mass: a band collides on
    a non-duplicate pair with probability ≈ s^rows, so the expected
    spurious candidates are ~bands·n²·E[s^rows]. The schedule rows =
    max(3, ⌈log10(n)⌉ − 2) holds rows=3 through ~100k docs — the r7
    sf1→sf3 ladder measured NO collision onset there (α 0.97 at 12/4
    once the 32-slice local-relation overhead was removed; the r6 α=1.36
    reading was partly that overhead) — then adds one row per further
    corpus decade, ahead of the birthday term. Bands re-center the
    S-curve on the threshold via the standard t ≈ (1/bands)^(1/rows)
    relation (at t=0.5, rows=3 that is 8 bands — the pinned 12/4
    tuning's capture probability at the threshold is only 0.41; the
    extra bands buy threshold-centered recall for 2× signature cost),
    capped so num_hashes = bands·rows stays within ``max_hashes``
    (signature cost per doc is linear in it; 144 ≳ the
    datasketch-style 128-perm default). Deterministic — record the
    choice with the signature store, exactly as ``lsh_tuning``
    prescribes, so incremental batches probe with the same banding
    forever.
    """
    import math

    if n_docs < 0:
        raise ValueError(f"n_docs must be >= 0, got {n_docs}")
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    rows = max(3, math.ceil(math.log10(max(n_docs, 10))) - 2)
    rows = min(rows, max_hashes // 2)
    bands = round((1.0 / threshold) ** rows)
    bands = max(1, min(bands, max_hashes // rows))
    return bands * rows, bands


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int | None = None,
    bands: int | None = None,
    n: int = 3,
    threshold: float = 0.5,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Full near-dup pipeline, fused: shingle-hash once, MinHash+LSH
    candidates, exact Jaccard verification — (id_a, id_b, jaccard).

    The shingle-hash relation is computed ONCE and localCheckpointed; the
    signature derives from it with pure arithmetic, and the verification
    join reads the same materialized sets. Running ``minhash_signature``
    and ``jaccard_pairs`` separately would shingle the corpus twice.

    ``num_hashes``/``bands`` default to ``lsh_auto_params(count, t)`` —
    banding keyed on corpus size, so collision onset self-corrects as
    the corpus grows (one count job when both are None). Pass both
    explicitly to reproduce a recorded tuning (the registry oracle pins
    12/4); passing exactly one of the two is an error since the pair is
    chosen jointly.

    ``hashes``: pass an already-materialized `shingle_hash_sets` output
    to share one shingling pass across pipelines (e.g. the LSH recall
    report runs this AND the exact PPJoin over the same corpus). The
    pairs are computed over ``hashes``' coverage, so when BOTH auto
    mode and ``hashes`` are in play the banding is keyed on
    ``hashes.count()`` — the corpus the tuning actually applies to —
    not ``df``, which may be a superset when the caller pre-filtered
    the hash relation (the incremental-containment pattern). Without
    ``hashes`` the key stays ``df.count()``, the full corpus size the
    registered dynamic oracle recomputes from ``COUNT(*)``.
    """
    if (num_hashes is None) != (bands is None):
        raise ValueError(
            "pass both num_hashes and bands, or neither (auto-tuned)"
        )
    if num_hashes is None:
        num_hashes, bands = lsh_auto_params(
            (hashes if hashes is not None else df).count(), threshold
        )
    sh = (
        hashes
        if hashes is not None
        else shingle_hash_sets(df, text_col, id_col, n).localCheckpoint(
            eager=True
        )
    )
    staged = sh.select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda h: h % F.lit(_H32_MOD)).alias("h32"),
    )
    sig_cols = []
    for i in range(num_hashes):
        a, b = perm_consts(i)
        sig_cols.append(
            F.array_min(
                F.transform(F.col("h32"), _perm_fn(a, b))
            ).alias(f"sig_{i}")
        )
    # NOT checkpointed before the candidate self-join: the r11 A/B
    # (profile_query, 3 runs) measured the extra serial job costing more
    # wall AND task than the duplicated 12-permutation arithmetic saves
    # (the permutations read the already-pinned shingle checkpoint, so
    # only narrow integer transforms recompute — unlike the raw
    # minhash_signature(materialize=True) path, which guards the full
    # shingle+md5 pipeline).
    sig = staged.select(id_col, *sig_cols)
    cand = minhash_lsh_candidates(sig, id_col, num_hashes, bands)
    sa = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter_sz = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                inter_sz / (F.size("sh_a") + F.size("sh_b") - inter_sz), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_store(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    n: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """(id, sh, sig_0..k-1) — the persistable near-dup signature store.

    This is the relation a production pipeline writes to the warehouse
    after each ingest so the NEXT batch can dedup against the corpus
    without touching corpus text again: ``sh`` (distinct int64 shingle
    hashes) powers exact Jaccard verification, the sig slots power LSH
    candidate probing. ~8 bytes x (shingles + k) per document — orders of
    magnitude smaller than the text it replaces. At scale, persist it
    bucketed by id (and keep a derived ``exploded_bands`` table bucketed
    by (band, band_key)) so probe joins are co-located.
    """
    sh = shingle_hash_sets(df, text_col, id_col, n)
    staged = sh.select(
        F.col(id_col),
        F.col("sh"),
        F.transform(F.col("sh"), lambda h: h % F.lit(_H32_MOD)).alias("h32"),
    )
    sig_cols = []
    for i in range(num_hashes):
        a, b = perm_consts(i)
        sig_cols.append(
            F.array_min(F.transform(F.col("h32"), _perm_fn(a, b))).alias(f"sig_{i}")
        )
    out = staged.select(id_col, "sh", *sig_cols)
    if materialize:
        out = out.localCheckpoint(eager=True)
    return out


def incremental_minhash_dedup(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Dedup an incoming batch against an existing corpus WITHOUT
    re-scanning the corpus: candidates come from probing the batch's LSH
    band keys against the persisted signature ``store``
    (``minhash_store`` shape) plus a batch-internal self-join; exact
    Jaccard verification runs on the stored shingle-hash sets.

    Returns one row per new document:
    ``(id, dup_of, jaccard, status)`` where ``dup_of`` is the SMALLEST
    matching doc id among store documents and earlier (smaller-id) batch
    documents with verified Jaccard >= threshold (NULL if none),
    ``jaccard`` is the similarity to that survivor, and ``status`` is
    'unique' / 'dup_of_store' / 'dup_in_batch'. The unique rows' store
    relation (``minhash_store`` of the batch filtered to unique) is what
    an ingest appends before the next batch.

    Scale shape: per-batch cost is O(batch) hashing + two equi-joins on
    (band, band_key) — the store side arrives pre-bucketed on that key,
    so the probe shuffles ONLY the batch's band rows; verification joins
    fetch shingle sets for candidate ids only. Nothing is ever O(corpus)
    per ingest, which is the entire point at 100 TB. This is min-id
    survivor assignment, not transitive-closure clustering — chains
    (new B dups new A which dups store S) keep per-pair evidence and are
    resolved by connected_components downstream when full clusters are
    needed.
    """
    batch = minhash_store(new_docs, text_col, id_col, num_hashes, n)
    nb = exploded_bands(batch, id_col, num_hashes, bands)
    sb = exploded_bands(store, id_col, num_hashes, bands)
    # id_a != id_b guards the store arm against self-matches when a
    # batch id already exists in the store (re-ingest); without it a
    # doc would report dup_of = itself at jaccard 1.0.
    cross = (
        nb.alias("b")
        .join(
            sb.alias("a"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    within = (
        nb.alias("a")
        .join(
            nb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
    )
    cand = cross.unionByName(within).distinct()
    sh_sources = store.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")
    ).unionByName(batch.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")))
    inter_sz = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    verified = (
        cand.join(sh_sources, "id_a")
        .join(
            batch.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                inter_sz / (F.size("sh_a") + F.size("sh_b") - inter_sz), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # struct-min orders by id_a first: the survivor is the smallest
    # matching id, and its jaccard rides along in the same aggregate.
    best = (
        verified.groupBy("id_b")
        .agg(F.min(F.struct(F.col("id_a"), F.col("jaccard"))).alias("m"))
        .select(
            F.col("id_b").alias(id_col),
            F.col("m.id_a").alias("dup_of"),
            F.col("m.jaccard").alias("jaccard"),
        )
    )
    store_ids = store.select(
        F.col(id_col).alias("dup_of"), F.lit(True).alias("_in_store")
    )
    return (
        new_docs.select(id_col)
        .join(best, id_col, "left")
        .join(store_ids, "dup_of", "left")
        .select(
            id_col,
            "dup_of",
            "jaccard",
            F.when(F.col("dup_of").isNull(), F.lit("unique"))
            .when(F.col("_in_store"), F.lit("dup_of_store"))
            .otherwise(F.lit("dup_in_batch"))
            .alias("status"),
        )
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Pairs with word-n-gram Jaccard >= threshold: (id_a, id_b, jaccard).

    Sets are the 60-bit shingle hashes (shingle_hash_sets): 8-byte join
    keys and array elements instead of shingle strings — the standard
    hashed-shingle formulation (collisions are ~|shingles|²/2^61 and the
    oracle mirrors the same hash, so results stay engine-identical).

    Without ``candidates``: exact sparse algorithm — explode distinct
    shingle hashes, self-join (only co-occurring docs ever meet), count
    match rows per pair (= the exact intersection size over distinct
    sets), filter. Two shuffles (shingle join, map-side-combined pair
    count; set sizes ride through as attributes) and no corpus² term:
    cost is sum over shingles of (docs-per-shingle choose 2) — the
    standard inverted-index bound, pre-pruned by the lossless size
    filter t*|a| <= |b| <= |a|/t.

    With ``candidates`` (e.g. from MinHash LSH): the inverted index is
    skipped entirely — candidate pairs join directly to the two documents'
    shingle-hash sets and the intersection is computed per pair with array
    functions. Work is proportional to |candidates|, not to shingle
    co-occurrence (the whole point of LSH). Jaccard is exact either way,
    so LSH only affects recall, never precision.
    """
    # The shingle relation feeds multiple plan branches; materialize once
    # instead of recomputing the shingling pipeline per branch (callers
    # running several pipelines over one corpus pass it in via `hashes`).
    # Both local paths read `sh` twice (the candidate-verify path joins
    # it on each side; the inverted-index self-join scans its explode
    # from both aliases), so an un-shared relation is pinned here.
    sh = hashes if hashes is not None else shingle_hash_sets(df, text_col, id_col, n)
    if hashes is None:
        sh = sh.localCheckpoint(eager=True)

    if candidates is not None:
        sa = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
        sb = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
        inter_sz = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
        return (
            candidates.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.round(
                    inter_sz
                    / (F.size("sh_a") + F.size("sh_b") - inter_sz),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )

    # Count-based inverted index (exact, the docstring's sparse
    # algorithm): explode the distinct hashes, self-join on the hash with
    # the lossless size filter (t*|a| <= |b| <= |a|/t), and aggregate the
    # match rows per pair — the per-pair match COUNT over distinct-hash
    # sets IS the intersection size, so no candidate materialization, no
    # distinct, and no per-pair array_intersect verify ever runs. The
    # r11-era prefix-filtered PPJoin variant this replaces cut the
    # inverted index to the (1-t)-prefixes but then re-intersected the
    # full hash ARRAYS per surviving candidate (458k candidates at
    # sf0.1/t=0.3 — the measured CPU floor of the recall report); the
    # count aggregate map-side-combines the same co-occurrence rows
    # instead. A/B on identical outputs (256 pairs sf0.1, 2560 pairs
    # sf1): sf0.1 task 7.2 -> 7.0 s, wall 3.4 -> 1.1 s; sf1 task 128 ->
    # 44 s, cpu 75 -> 30 s — better at BOTH rungs, more so at scale
    # (the verify term grew with candidate count; the count term grows
    # with true co-occurrence mass, which the size filter bounds).
    tok = sh.select(
        F.col(id_col), F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("g")
    )
    a, b = tok.alias("a"), tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh"))
            & (F.col("a.n_sh") >= F.lit(threshold) * F.col("b.n_sh")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("__c"),
            # (id, n_sh) is functionally dependent on id — max() just
            # carries the attribute through the aggregate
            F.max("a.n_sh").alias("__na"),
            F.max("b.n_sh").alias("__nb"),
        )
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("__c") / (F.col("__na") + F.col("__nb") - F.col("__c")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """32-bit SimHash per document: (id, simhash).

    token_hash = first 8 hex chars of md5(token) as an int (conv base
    16->10); each bit position accumulates +1/-1 per token occurrence
    (with multiplicity); bit set iff the sum is > 0.

    Plan: explode tokens, then ONE groupBy(id) carrying 32 conditional-sum
    aggregate columns (one per bit) plus the token count; bit b of the
    result is set iff more than half the token occurrences have bit b set.
    Everything stays in whole-stage codegen with map-side partial combine,
    and the shuffle moves |docs| x 33 longs — no 32x per-bit row blowup
    (the explode-bits formulation shuffled 32 rows per token).
    """
    # stage + cheap-filter + explode_outer: a bare explode makes Catalyst
    # infer size()>0 and push it below the projection, re-running the
    # tokenizer twice per row
    toks = (
        df.select(F.col(id_col), ws_tokens(text_col).alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(F.col(id_col), F.explode_outer("__toks").alias("tok"))
    )
    hashed = toks.select(
        F.col(id_col),
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("th"),
    )
    bit_counts = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1))).alias(f"__b{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    # bit set iff ones outnumber zeros: 2*ones > n (same as sum(+1/-1) > 0)
    simhash_val = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            2 * F.col(f"__b{b}") > F.col("__n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        simhash_val = term if simhash_val is None else simhash_val + term
    return bit_counts.select(F.col(id_col), simhash_val.alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Pairs of docs with SimHash Hamming distance <= max_hamming.

    Banded by pigeonhole: with ``bands`` equal bit-slices, any pair within
    Hamming distance bands-1 agrees exactly on at least one slice — so an
    equi-join per slice finds all such pairs without n² comparison, then
    the exact Hamming filter (bit_count(xor)) keeps true matches.
    Requires max_hamming <= bands - 1 for lossless recall.

    ``bits`` is the hash width (default the 32-bit text SimHash). Width
    is THE scale lever for candidate density: bucket keys carry
    ``bits/bands`` bits, so a 32-bit hash cut into 8 bands yields 4-bit
    keys — 16 buckets per band, which goes pairwise-dense once the
    corpus passes ~10k items — while a 64-bit hash at the same 8 bands
    yields 256 buckets and an order-of-magnitude sparser join. (On
    uniformly random hashes the TRUE result is itself quadratically
    dense by the birthday bound — sum_{i<=h} C(bits,i)/2^bits of all
    pairs — so the ladder's measured alpha for the 32-bit variant is
    output-bound, not plan overhead; see SCALE.md round-5 ladder.)
    """
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole recall needs max_hamming <= bands - 1")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(mask)
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    exploded = sim.select(
        F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.band_key")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def _simhash_band_rows(
    sig: DataFrame, id_col: str, bands: int, bits: int
) -> DataFrame:
    """Explode (id, simhash) into per-band pigeonhole rows
    (id, simhash, band, band_key) — the probe-side relation of a
    banded Hamming join. Same construction as simhash_near_pairs'
    inline explosion; shared here so the incremental operator probes
    a persisted store with identical keys."""
    width = bits // bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * width)
                .bitwiseAND(mask)
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sig.select(
        F.col(id_col), F.col("simhash"), F.explode(band_structs).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.band_key")


def incremental_simhash_dedup(
    new_docs: DataFrame,
    store_sig: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Dedup an incoming batch against a persisted SimHash signature
    store (``simhash`` output shape: (id, simhash)) without re-hashing
    corpus text — the SimHash member of the incremental family
    (``incremental_minhash_dedup``, ``incremental_containment``,
    weburl.incremental_url_dedup).

    Returns one row per batch document that produced a signature:
    ``(id, dup_of, hamming, status)`` where ``dup_of`` is the SMALLEST
    matching doc id among store documents and earlier (smaller-id)
    batch documents at Hamming distance <= max_hamming (NULL if none),
    ``hamming`` the distance to that survivor, and ``status`` is
    'unique' / 'dup_of_store' / 'dup_in_batch' — the same min-id
    survivor convention as the MinHash twin.

    Scale shape: per-ingest cost is O(batch) hashing + two equi-joins
    on (band, band_key) — persist the store's band rows bucketed on
    that key and the probe shuffles only the batch's bands; the
    pigeonhole guarantee (max_hamming <= bands - 1) makes the banded
    probe lossless, and the exact bit_count(xor) filter keeps only
    true matches. Nothing is O(corpus) per ingest.
    """
    if max_hamming > bands - 1:
        raise ValueError("pigeonhole recall needs max_hamming <= bands - 1")
    if bits % bands:
        raise ValueError("bits must divide evenly into bands")
    # materialize the batch signature ONCE: it feeds three plan branches
    # (store probe + both self-join sides) and recomputing the tokenize/
    # hash aggregate per branch would triple the batch scan — the same
    # persist-the-signature discipline as minhash_store
    batch = simhash(new_docs, text_col, id_col).localCheckpoint(eager=True)
    nb = _simhash_band_rows(batch, id_col, bands, bits)
    sb = _simhash_band_rows(store_sig, id_col, bands, bits)

    def _matches(left: DataFrame, right: DataFrame, strict_lt: bool) -> DataFrame:
        cond = (F.col("a.band") == F.col("b.band")) & (
            F.col("a.band_key") == F.col("b.band_key")
        )
        if strict_lt:
            cond = cond & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        else:
            # store arm: a re-ingested id present in the store would
            # otherwise self-match at hamming 0 and report dup_of = itself
            cond = cond & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        return (
            left.alias("a")
            .join(right.alias("b"), cond)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                )
                .cast("long")
                .alias("hamming"),
            )
            .distinct()
            .filter(F.col("hamming") <= max_hamming)
        )

    cand = _matches(sb, nb, strict_lt=False).unionByName(
        _matches(nb, nb, strict_lt=True)
    )
    # struct-min orders by id_a first: smallest matching id wins and its
    # hamming rides along (same aggregate as the MinHash twin).
    best = (
        cand.groupBy("id_b")
        .agg(F.min(F.struct(F.col("id_a"), F.col("hamming"))).alias("m"))
        .select(
            F.col("id_b").alias(id_col),
            F.col("m.id_a").alias("dup_of"),
            F.col("m.hamming").alias("hamming"),
        )
    )
    store_ids = store_sig.select(
        F.col(id_col).alias("dup_of"), F.lit(True).alias("_in_store")
    )
    return (
        batch.select(id_col)
        .join(best, id_col, "left")
        .join(store_ids, "dup_of", "left")
        .select(
            id_col,
            "dup_of",
            "hamming",
            F.when(F.col("dup_of").isNull(), F.lit("unique"))
            .when(F.col("_in_store"), F.lit("dup_of_store"))
            .otherwise(F.lit("dup_in_batch"))
            .alias("status"),
        )
    )


def lsh_tuning(num_hashes: int, threshold: float) -> tuple[int, int]:
    """Choose (bands, rows) for banded MinHash-LSH at a target Jaccard
    threshold: over all factorizations ``bands * rows == num_hashes``,
    minimize the S-curve's total error mass around the threshold
    (integral of the capture probability ``1 - (1 - s^rows)^bands``
    below t, plus its miss probability above t — the standard
    Mining-of-Massive-Datasets tuning rule, computed by direct numeric
    integration; no closed form needed at these sizes).

    Returns the (bands, rows) pair whose candidate-capture curve steps
    closest to the ideal step function at ``threshold``. Deterministic —
    a corpus pipeline records the choice next to the signature store so
    incremental batches probe with the SAME banding forever.
    """
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    best: tuple[float, int, int] | None = None
    n_steps = 1000
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        err = 0.0
        for i in range(n_steps):
            s = (i + 0.5) / n_steps
            p = 1.0 - (1.0 - s**rows) ** bands
            err += (p if s < threshold else 1.0 - p) / n_steps
        key = (err, rows, bands)
        if best is None or key < best:
            best = key
    assert best is not None
    return best[2], best[1]


def winnow_fingerprints(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    window: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm): over the document's n-gram hash sequence, keep the MINIMUM
    hash of every sliding window of ``window`` consecutive hashes, then
    distinct — a guaranteed-coverage SAMPLE of the span hashes (any match
    of length >= n + window - 1 tokens is always detected, while storing
    only ~2/(window+1) of the spans). The sampled fingerprint set is what
    a plagiarism/overlap index stores at corpus scale instead of every
    span.

    Output: (id, fp) with fp = array of distinct winnowed 60-bit hashes.
    Everything is array higher-order functions over the POSITIONAL hash
    sequence (order matters — shingle_hash_sets' distinct sets cannot be
    used here); ties inside a window resolve to the minimum value, which
    is position-independent and therefore engine-portable.
    """
    t1 = df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
    h = lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")  # noqa: E731
    seq = F.transform(shingles_of(F.col("__toks"), n), h)
    # localCheckpoint barrier: Catalyst's CollapseProject would otherwise
    # inline the md5 hash pipeline into EVERY sliding-window reference
    # below (measured ~100x at sf0.01); materializing the narrow
    # (id, hash-sequence) relation pins it to one hash pass.
    staged = (
        t1.filter(F.size("__toks") >= n + window - 1)
        .select(F.col(id_col), seq.alias("__h"))
        .localCheckpoint(eager=False)
    )
    # windowed min via a chained shifted-pair reduction — O(len) slices
    # total instead of one slice per window position.
    expr = "__h"
    span = 1
    while span < window:
        step = min(span, window - span)
        expr = (
            f"zip_with(slice({expr}, 1, size({expr}) - {step}),"
            f" slice({expr}, {step + 1}, size({expr}) - {step}),"
            " (x, y) -> least(x, y))"
        )
        span += step
    return staged.select(
        F.col(id_col), F.array_distinct(F.expr(expr)).alias("fp")
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    the sampled-index overlap detector. Same inverted-index shape as the
    exact span join (explode fingerprints, self-equi-join on the hash,
    count per pair) but over the winnowed sample, so index size and join
    fan-in shrink by ~(window+1)/2 while any sufficiently long overlap
    still surfaces."""
    fp = winnow_fingerprints(df, text_col, id_col, n, window)
    ex = fp.select(F.col(id_col), F.explode("fp").alias("h"))
    a = ex.select(F.col(id_col).alias("id_a"), "h")
    b = ex.select(F.col(id_col).alias("id_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def incremental_winnow_dedup(
    new_docs: DataFrame,
    store_fp: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 4,
    window: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Dedup an incoming batch against a persisted winnowing fingerprint
    index (``winnow_fingerprints`` output shape: (id, fp)) — the
    winnowing member of the incremental family
    (``incremental_minhash_dedup``, ``incremental_simhash_dedup``,
    ``incremental_containment``, weburl.incremental_url_dedup).

    Returns one row per batch document that produced fingerprints:
    ``(id, dup_of, n_shared, status)`` where ``dup_of`` is the SMALLEST
    doc id among store documents and earlier (smaller-id) batch
    documents sharing >= min_shared winnowed fingerprints (NULL if
    none), ``n_shared`` the overlap with that survivor, and ``status``
    'unique' / 'dup_of_store' / 'dup_in_batch'.

    Scale shape: per-ingest cost is O(batch) fingerprinting + two
    inverted-index equi-joins on the fingerprint hash — persist the
    store's exploded (h, id) postings bucketed on h and the probe
    shuffles only the batch's postings. The MOSS guarantee carries
    over: any overlap of >= n + window - 1 tokens with a store doc is
    always detected. Nothing is O(corpus) per ingest.
    """
    # materialize the batch fingerprints ONCE (probe + self-join + base
    # relation) — the persist-the-signature discipline
    batch_fp = winnow_fingerprints(
        new_docs, text_col, id_col, n, window
    ).localCheckpoint(eager=True)
    bx = batch_fp.select(F.col(id_col), F.explode("fp").alias("h"))
    sx = store_fp.select(F.col(id_col), F.explode("fp").alias("h"))

    def shared(left: DataFrame, right: DataFrame, strict_lt: bool) -> DataFrame:
        a = left.select(F.col(id_col).alias("id_a"), "h")
        b = right.select(F.col(id_col).alias("id_b"), "h")
        j = a.join(b, "h")
        if strict_lt:
            j = j.filter(F.col("id_a") < F.col("id_b"))
        else:
            # store arm: guard re-ingested ids from matching themselves
            j = j.filter(F.col("id_a") != F.col("id_b"))
        return (
            j.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= min_shared)
        )

    cand = shared(sx, bx, strict_lt=False).unionByName(
        shared(bx, bx, strict_lt=True)
    )
    best = (
        cand.groupBy("id_b")
        .agg(F.min(F.struct(F.col("id_a"), F.col("n_shared"))).alias("m"))
        .select(
            F.col("id_b").alias(id_col),
            F.col("m.id_a").alias("dup_of"),
            F.col("m.n_shared").alias("n_shared"),
        )
    )
    store_ids = store_fp.select(
        F.col(id_col).alias("dup_of"), F.lit(True).alias("_in_store")
    )
    return (
        batch_fp.select(id_col)
        .join(best, id_col, "left")
        .join(store_ids, "dup_of", "left")
        .select(
            id_col,
            "dup_of",
            "n_shared",
            F.when(F.col("dup_of").isNull(), F.lit("unique"))
            .when(F.col("_in_store"), F.lit("dup_of_store"))
            .otherwise(F.lit("dup_in_batch"))
            .alias("status"),
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    tau_e2: int = 80,
    max_df: int | None = None,
    min_size: int | None = None,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC containment near-dup pairs: ordered (id_a, id_b) with
    C(a -> b) = |S_a ∩ S_b| / |S_a| >= tau_e2/100, over distinct hashed
    word n-gram shingles (shingle_hash_sets).

    Containment is the dedup relation Jaccard misses: a short document
    quoted whole inside a long one has Jaccard ~|S_a|/|S_b| (tiny) but
    containment 1.0 — the quote/superset/boilerplate-wrapper case every
    pretraining-dedup pipeline needs alongside symmetric near-dup
    (Broder's containment sketches are this measure).

    Exact sparse algorithm, same inverted-index shape as jaccard_pairs:
    explode distinct shingle hashes, self-equi-join (only co-occurring
    docs meet — no corpus² term), count per ORDERED pair, join |S_a|,
    then an exact INTEGER threshold (100·inter >= tau_e2·|S_a| — no
    float compare at the boundary). The displayed ratio goes through the
    sign-correct floor kernel at 4 dp.

    ``max_df``: optional document-frequency cap — shingles present in
    more than max_df documents are dropped from the index before the
    join (both the |S_a| denominator and the intersection, mirrored in
    any oracle). This is the skew lever at corpus scale: boilerplate
    shingles otherwise contribute (docs-per-shingle)² join fan-in while
    carrying no near-dup signal.

    ``min_size``: optional post-cap denominator floor — a doc whose
    SURVIVING shingle set is smaller than min_size is excluded as an
    ``id_a`` (it can still be the containing side ``id_b``). The cap's
    standard companion: aggressively capped docs shrink to a handful
    of rare shingles, and an 80%-of-almost-nothing threshold passes on
    noise (measured on the driver corpus: cap=8 alone inflates sf0.1
    pairs 512 -> 856; with min_size=10 the set is an honest 192).

    Output: (id_a, id_b, inter, n_a, containment) — both directions of a
    pair can appear (asymmetry is the point).
    """
    from etl_gardener_spark.functions.exact import floor_div_expr

    sh = (
        hashes
        if hashes is not None
        else shingle_hash_sets(df, text_col, id_col, n).localCheckpoint(
            eager=True
        )
    )
    ex = sh.select(F.col(id_col), F.explode("sh").alias("__h"))
    if max_df is not None:
        keep = (
            ex.groupBy("__h")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("__h")
        )
        ex = ex.join(keep, "__h")
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    if min_size is not None:
        sizes = sizes.filter(F.col("n_a") >= min_size)
    a = ex.select(F.col(id_col).alias("id_a"), "__h")
    b = ex.select(F.col(id_col).alias("id_b"), "__h")
    # The intersection count is SYMMETRIC: aggregate each unordered pair
    # once (id_a < id_b — half the pair-join and groupBy volume), then
    # emit both directions before the per-direction |S_a| threshold.
    half = (
        a.join(b, "__h")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    inter = half.unionByName(
        half.select(
            F.col("id_b").alias("id_a"),
            F.col("id_a").alias("id_b"),
            "inter",
        )
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a"), "id_a")
        .filter(F.col("inter") * 100 >= F.lit(tau_e2) * F.col("n_a"))
        .select(
            "id_a",
            "id_b",
            "inter",
            "n_a",
            (
                F.expr(
                    floor_div_expr("2 * inter * 10000 + n_a", "2 * n_a")
                ).cast("double")
                / 10000.0
            ).alias("containment"),
        )
    )


def split_leakage_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    weights: dict[str, float],
    train_label: str = "train",
    eval_label: str = "test",
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Train/eval contamination report: for every EVAL document that
    shares >= min_shared distinct hashed n-gram shingles with any TRAIN
    document (under the deterministic md5 hash_split), one row

        (test_id, n_train_dups, max_shared, n_test_shingles)

    — how many train documents collide with it and the largest shared
    count. The decontamination question every eval harness asks
    ("did the benchmark leak into the training split?") as one
    inverted-index join: explode eval-side shingles, equi-join the
    train-side index (co-occurrence only), aggregate per (test, train)
    pair, threshold, aggregate per test doc. Cost is the same
    inverted-index bound as jaccard_pairs restricted to cross-split
    collisions; the hash split itself is a per-row projection
    (sampling.hash_split), so the report composes with any corpus
    without a new shuffle of the corpus itself.
    """
    from etl_gardener_spark.operators.sampling import hash_split

    labeled = hash_split(df.select(id_col, text_col), id_col, weights)
    # Three consumers (train index, eval index, eval set sizes) hang off
    # the shingle relation — materialize once, like jaccard_pairs does,
    # instead of re-tokenizing and re-hashing the corpus per branch
    # (measured 11.8 s -> see SCALE.md round-6 ladder).
    sh = (
        shingle_hash_sets(labeled, text_col, id_col, n)
        .join(labeled.select(id_col, "split"), id_col)
        .localCheckpoint(eager=True)
    )
    ex = sh.select(F.col(id_col), "split", F.explode("sh").alias("__h"))
    tr = ex.filter(F.col("split") == train_label).select(
        F.col(id_col).alias("train_id"), "__h"
    )
    te = ex.filter(F.col("split") == eval_label).select(
        F.col(id_col).alias("test_id"), "__h"
    )
    pair = (
        te.join(tr, "__h")
        .groupBy("test_id", "train_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    n_sh = sh.filter(F.col("split") == eval_label).select(
        F.col(id_col).alias("test_id"),
        F.size("sh").cast("long").alias("n_test_shingles"),
    )
    return (
        pair.groupBy("test_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_dups"),
            F.max("shared").cast("long").alias("max_shared"),
        )
        .join(n_sh, "test_id")
        .select("test_id", "n_train_dups", "max_shared", "n_test_shingles")
    )


def containment_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Persistable inverted index for containment checks: one row per
    (store_id, shingle hash) — exactly the relation
    :func:`incremental_containment` probes. Written as a parquet table
    bucketed/partitioned on the hash at deployment, so a daily ingest
    joins against it without rebuilding history (same store discipline
    as minhash_store / line_hash_store). ``hashes``: reuse an existing
    shingle_hash_sets relation instead of re-shingling."""
    sh = (
        hashes
        if hashes is not None
        else shingle_hash_sets(df, text_col, id_col, n)
    )
    return sh.select(
        F.col(id_col).alias("store_id"), F.explode("sh").alias("__h")
    )


def incremental_containment(
    batch: DataFrame,
    store_index: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    tau_e2: int = 80,
    hashes: DataFrame | None = None,
) -> DataFrame:
    """Ingest-time containment screen: for each INCOMING document, the
    store documents that contain >= tau_e2/100 of its distinct shingles
    — 'is this new document mostly already in the corpus?', the
    asymmetric version of incremental_minhash_dedup's question, WITHOUT
    rescanning stored text (only the compact (store_id, hash) index is
    read).

    Output: (batch_id, store_id, inter, n_batch, containment), where
    containment = inter / n_batch through the sign-correct floor kernel.
    By construction equals the full-corpus containment_pairs restricted
    to batch->store ordered pairs — which is what the oracle states.

    Scale shape: the batch side explodes O(batch tokens) rows; the join
    hits only index entries sharing a hash (inverted-index bound), and
    the per-pair aggregate is keyed on (batch_id, store_id). Cost is
    O(batch) + collision fan-in, independent of corpus history size.
    """
    from etl_gardener_spark.functions.exact import floor_div_expr

    # one batch-shingling pass: the exploded batch feeds BOTH the
    # denominator aggregate and the index probe join (without the
    # checkpoint each re-tokenizes and re-hashes the batch).
    # ``hashes``: pass an already-materialized shingle_hash_sets output
    # covering the batch to share one shingling pass with other
    # pipelines (same convention as minhash_lsh_pairs/containment_pairs)
    sh_b = (
        hashes
        if hashes is not None
        else shingle_hash_sets(batch, text_col, id_col, n)
    )
    ex_b = (
        sh_b.select(
            F.col(id_col).alias("batch_id"), F.explode("sh").alias("__h")
        )
        .localCheckpoint(eager=False)
    )
    sizes = ex_b.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_batch")
    )
    inter = (
        ex_b.join(store_index, "__h")
        .groupBy("batch_id", "store_id")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(sizes, "batch_id")
        .filter(F.col("inter") * 100 >= F.lit(tau_e2) * F.col("n_batch"))
        .select(
            "batch_id",
            "store_id",
            "inter",
            "n_batch",
            (
                F.expr(
                    floor_div_expr("2 * inter * 10000 + n_batch", "2 * n_batch")
                ).cast("double")
                / 10000.0
            ).alias("containment"),
        )
    )


def hamming_near_pairs_blocked(
    sim: DataFrame,
    id_col: str,
    max_hamming: int = 4,
    n_blocks: int = 6,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` via BLOCK-COMBINATION
    tables (Manku/Jain/Das Sarma's SimHash web-dedup construction) —
    the generalization of ``simhash_near_pairs``' classic banding that
    decouples recall from key width.

    Classic banding is the special case n_blocks = max_hamming + 1 with
    1-block keys: recall is guaranteed, but key width collapses to
    bits/(h+1) — at h=7 over 56 bits that is 7-bit keys (128 buckets),
    which goes pairwise-dense past a few thousand items (measured in
    the r8 mm_phash redesign). Here the hash splits into ``n_blocks``
    equal blocks and each table keys on a COMBINATION of
    k = n_blocks − max_hamming blocks: a pair within h flips has ≥
    n_blocks − h clean blocks, so at least one k-combination is
    entirely clean — recall stays exact while keys carry k·(bits/
    n_blocks) bits. The price is C(n_blocks, k) tables instead of h+1
    bands: e.g. h=4 over 60 bits — classic is 5 bands × 12-bit keys
    (4k buckets); blocked with n_blocks=6 is C(6,2)=15 tables ×
    20-bit keys (1M buckets) — 3x the index rows for 256x sparser
    buckets, the trade a large corpus wants. Candidate pairs are
    verified with the exact bit_count(xor) filter either way, so the
    construction only affects WORK, never the result.

    Requires n_blocks > max_hamming and bits % n_blocks == 0.
    """
    from itertools import combinations

    if n_blocks <= max_hamming:
        raise ValueError(
            "block-combination recall needs n_blocks > max_hamming "
            f"(got {n_blocks} blocks for h={max_hamming})"
        )
    if bits % n_blocks:
        raise ValueError("bits must divide evenly into n_blocks")
    k = n_blocks - max_hamming
    width = bits // n_blocks
    mask = (1 << width) - 1
    structs = []
    for t, combo in enumerate(combinations(range(n_blocks), k)):
        key = F.lit(0).cast("long")
        for i, bidx in enumerate(combo):
            blk = (
                F.shiftright(F.col("simhash"), bidx * width)
                .bitwiseAND(F.lit(mask))
            )
            key = key.bitwiseOR(F.shiftleft(blk, i * width))
        structs.append(
            F.struct(F.lit(t).alias("band"), key.alias("band_key"))
        )
    exploded = sim.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*structs)).alias("bk")
    ).select(id_col, "simhash", "bk.band", "bk.band_key")
    a, b = exploded.alias("a"), exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)
