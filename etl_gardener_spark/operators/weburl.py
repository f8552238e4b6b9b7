"""URL-keyed dedup and host-level corpus profiling.

The first dedup pass every web-scale pipeline runs is NOT content
similarity — it is "have I fetched this page before", keyed on the
canonical URL (CCNet dedups per-snapshot by URL before paragraph
hashing; RefinedWeb's Macrodata pipeline starts with URL dedup), and
the first skew/quality lever is the per-host profile (host caps,
blocklists). Both are single hash-aggregations over the canonicalized
key (functions/urls.py) — one shuffle each, no pairwise stage, so they
scale as far as groupBy does: at 100 TB the only hot spot is a
mega-host key (doc count, not URL count — canonical URLs are near
unique), and AQE skew handling or a salted two-phase count covers it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_gardener_spark.functions.urls import canonical_url, url_host


def url_dedup(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Exact dedup by canonical URL: one row per canonical URL with the
    kept (smallest-id) document and the group size — the same keep-min
    survivor policy as exact_dup_groups. Output: (canonical_url,
    keep_id, n_docs).

    Plan: map-side canonicalization (pure regex expressions) + ONE
    hash aggregate with partial (map-side) min/count combine."""
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def host_profile(df: DataFrame, url_col: str, id_col: str) -> DataFrame:
    """Per-host dedup profile: (host, n_docs, n_urls, dup_count) where
    n_urls counts DISTINCT canonical URLs and dup_count = n_docs -
    n_urls is the mass URL dedup would remove. The inputs to host caps
    (domain_cap in operators/sampling.py takes this relation's shape)
    and to boilerplate triage (a host whose dup_count explodes serves
    one page under many URLs).

    Exact distinct by design (the profile feeds cap DECISIONS; estimates
    belong in the sketch family): two-key partial aggregation —
    (host, canonical_url) first, then host — so the wide shuffle is on
    the near-unique composite key, never a per-host row explosion."""
    per_url = (
        df.select(
            url_host(F.col(url_col)).alias("host"),
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("host", "canonical_url")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return per_url.groupBy("host").agg(
        F.sum("n").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
        (F.sum("n") - F.count(F.lit(1))).alias("dup_count"),
    )


def incremental_url_dedup(
    new_docs: DataFrame, store: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """URL dedup for INCREMENTAL ingest: dedup an incoming batch against
    the persisted canonical-URL relation (``url_dedup`` output shape:
    (canonical_url, keep_id, ...)) without re-scanning the corpus.

    Returns one row per new document: (id, canonical_url, dup_of,
    status) with the same min-id survivor semantics as
    ``incremental_minhash_dedup``: a batch doc is 'dup_of_store' when
    its canonical URL exists in the store (dup_of = the stored
    keep_id — store always outranks batch), 'dup_in_batch' when an
    earlier (smaller-id) batch doc canonicalizes to the same URL, else
    'unique'. The unique rows are what an ingest appends to the store
    before the next batch.

    Scale shape: O(batch) canonicalization (pure regex, map-side) + one
    batch-internal aggregate + one equi-join against the store on
    canonical_url — the store side arrives partitioned on its key at
    warehouse scale, so the probe shuffles only the batch. Nothing is
    O(corpus) per ingest."""
    b = new_docs.select(
        canonical_url(F.col(url_col)).alias("canonical_url"),
        F.col(id_col),
    )
    batch_min = b.groupBy("canonical_url").agg(
        F.min(id_col).alias("__bmin")
    )
    st = store.select(
        "canonical_url", F.col("keep_id").alias("__store_keep")
    )
    j = b.join(batch_min, "canonical_url").join(st, "canonical_url", "left")
    in_store = F.col("__store_keep").isNotNull()
    in_batch = F.col(id_col) > F.col("__bmin")
    return j.select(
        F.col(id_col),
        "canonical_url",
        F.when(in_store, F.col("__store_keep"))
        .when(in_batch, F.col("__bmin"))
        .alias("dup_of"),
        F.when(in_store, F.lit("dup_of_store"))
        .when(in_batch, F.lit("dup_in_batch"))
        .otherwise(F.lit("unique"))
        .alias("status"),
    )
