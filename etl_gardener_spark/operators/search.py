"""Full-text relevance ranking (BM25) and corpus n-gram statistics.

A training-data pipeline needs keyword retrieval over the corpus —
targeted quality audits ("show me the top docs for this topic"),
decontamination forensics, and mixture construction all start from a
ranked keyword query. BM25 (Robertson-Sparck Jones; the Lucene-default
``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` variant) is the standard
scoring function.

Spark-first shape: the inverted index is the exploded (doc, term) pair
set. Query terms are filtered BEFORE any aggregation, so the shuffled
volume is per-query-term postings, not the whole index. Corpus-level
constants (N, avgdl) come from a one-row aggregate over the un-exploded
docs (no index-wide groupBy), and per-term document frequencies are a
terms-sized aggregate; both broadcast back into the postings join, so
the postings side shuffles exactly once (on doc, for the final sum).
At 100 TB: postings for a handful of terms are a sliver of the corpus —
the plan is one filtered wide pass plus two broadcasts.

Determinism: per-(doc, term) BM25 weights are doubles computed by an
identical expression tree in Spark and the DuckDB oracle (bit-equal),
but their per-doc SUM would be fold-order-dependent — so weights are
fixed-point-scaled to integer micros first and summed exactly. Scores,
and the ranking they induce, are therefore bit-stable across engines,
reruns, and partitionings.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_gardener_spark.functions.text import ws_tokens


def bm25_topk(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25.

    Returns (doc, score, n_hit_terms, rank); ``score`` is the exact
    integer-micro sum divided back to a double (see module docstring).
    """
    terms = [t.lower() for t in terms]
    toked = docs.select(
        F.col(id_col).alias("doc"), ws_tokens(text_col).alias("toks")
    )

    # one-row corpus stats straight off the token arrays — no explode
    stats = toked.select(F.size("toks").alias("dl")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )

    postings = toked.select(
        "doc", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    ).filter(F.col("term").isin(list(terms)))
    tf = postings.groupBy("doc", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"), F.first("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl")
                )
            ),
        )
        # fixed-point micros: floor(w*1e6 + 0.5) on identical doubles is
        # identical in both engines; integer sums are fold-order-free.
        .withColumn(
            "w_e6", F.floor(F.col("w") * F.lit(1e6) + F.lit(0.5)).cast("long")
        )
    )
    per_doc = scored.groupBy("doc").agg(
        (F.sum("w_e6").cast("double") / F.lit(1e6)).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
    )
    w = Window.orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bm25_oracle_sql(
    terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    toks_cte: str = "d",
    cte_name: str | None = None,
) -> str:
    """DuckDB mirror of `bm25_topk` over a CTE ``d(doc_id, toks)`` — the
    same expression tree (same literal order, same ln, same fixed-point
    fold) so scores match bit-for-bit. With ``cte_name`` the final ranked
    SELECT is wrapped as one more CTE so a composite oracle (hybrid
    retrieval) can keep building on it."""
    terms_sql = "[" + ",".join(f"'{t.lower()}'" for t in terms) + "]"
    final = f"""SELECT doc, score, n_hit_terms,
           CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc ASC) AS BIGINT) AS rank
    FROM per_doc QUALIFY rank <= {k}"""
    tail = f", {cte_name} AS ({final})" if cte_name else final
    return f"""
    stats AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(len(toks)) AS avgdl
      FROM {toks_cte}),
    base AS (
      SELECT doc_id AS doc, len(toks) AS dl, unnest(toks) AS term
      FROM {toks_cte}),
    tf AS (
      SELECT doc, term, CAST(COUNT(*) AS DOUBLE) AS tf, ANY_VALUE(dl) AS dl
      FROM base WHERE list_contains({terms_sql}, term) GROUP BY doc, term),
    dfreq AS (
      SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc,
             CAST(FLOOR(
               ln(1.0 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * (tf.tf * {k1 + 1.0!r})
               / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r}
                  * CAST(tf.dl AS DOUBLE) / s.avgdl))
               * 1000000.0 + 0.5) AS BIGINT) AS w_e6
      FROM tf JOIN dfreq f USING (term) CROSS JOIN stats s),
    per_doc AS (
      SELECT doc, CAST(SUM(w_e6) AS DOUBLE) / 1000000.0 AS score,
             CAST(COUNT(*) AS BIGINT) AS n_hit_terms
      FROM scored GROUP BY doc)
    {tail}
    """


def topk_ngrams(
    docs: DataFrame, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide top-k word n-grams by total count (ties broken by the
    n-gram string) — the corpus profile that drives boilerplate and
    template detection. Explode + count is one map-side-combined shuffle
    on the n-gram; the top-k is a WindowGroupLimit over the (small)
    distinct-n-gram aggregate, not the raw pair stream."""
    body = ", ".join(f"element_at(__toks, i + {j})" for j in range(n))
    # guard: sequence(1, 0) would produce a DESCENDING [1, 0] in Spark,
    # so short docs get an explicit empty gram list.
    grams = F.when(
        F.size("__toks") >= n,
        F.expr(
            f"transform(sequence(1, size(__toks) - {n - 1}), "
            f"i -> concat_ws(' ', {body}))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select(ws_tokens(text_col).alias("__toks"))
        .select(F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("ngram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    lists: dict[str, DataFrame],
    id_col: str = "doc",
    rank_col: str = "rank",
    k_rrf: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of named ranked lists (Cormack, Clarke &
    Buettcher, SIGIR 2009) — the standard way to combine lexical (BM25)
    and vector (ANN) retrieval without score calibration, since only
    RANKS cross the boundary.

    Per-list contribution is the exact integer ``1e9 div (k_rrf + rank)``
    (IntegralDivide — no float, so fusion scores are bit-stable and
    fold-order-free); ``rrf_score`` divides back to a double for display.
    Output: (id, <name>_rank for each input list — NULL when the doc
    missed that list — rrf_score, rank), ties broken by id ASC.

    Scale shape: the inputs are top-k lists (bounded by construction),
    so the union + one hash aggregate + the global tie-break window all
    run on O(sum of k's) rows regardless of corpus size — the corpus was
    already reduced by each retriever.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    parts = [
        df.select(
            F.col(id_col).alias("__id"),
            F.lit(name).alias("__src"),
            F.col(rank_col).cast("long").alias("__r"),
        )
        for name, df in lists.items()
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("__id").agg(
        F.sum(F.expr(f"1000000000 div ({k_rrf} + __r)")).alias("__e9"),
        *[
            F.max(F.when(F.col("__src") == name, F.col("__r"))).alias(
                f"{name}_rank"
            )
            for name in lists
        ],
    )
    w = Window.orderBy(F.col("__e9").desc(), F.col("__id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select(
            F.col("__id").alias(id_col),
            *[f"{name}_rank" for name in lists],
            (F.col("__e9").cast("double") / F.lit(1e9)).alias("rrf_score"),
            "rank",
        )
    )
