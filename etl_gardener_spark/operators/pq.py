"""Product quantization (PQ): compress embeddings to m sub-space codes
and search over the codes with asymmetric distance computation (ADC).

This is the memory-footprint path of large-scale similarity search
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the IVF-PQ layout FAISS popularized): the corpus vector
(d floats, 256 B at d=64) is replaced by m codebook indices (m bytes at
k_sub <= 256), so a 100 TB float corpus becomes ~1.5 TB of codes that
fit a far smaller cluster — and queries never touch raw corpus vectors:

* **Encode** (one corpus pass, amortized): each vector's s-th sub-slice
  is assigned to its nearest codebook entry — a narrow broadcast join
  of |corpus| x k_sub rows folded by one map-side-combined min_by
  aggregate per sub-space, exactly the IVF assignment shape
  (similarity.cosine_topk_ivf). No shuffle of the raw vectors.
* **Search** (per query batch): the query computes its m x k_sub
  distance TABLE (tiny — broadcast), which is equi-joined to the
  exploded code columns; the approximate distance is a SUM of m table
  lookups. Corpus-side I/O is the code table only.

Determinism discipline (the repo-wide exact-kernel rule): sub-space
squared-L2 distances are doubles from an identical left-to-right
index-order fold in both engines, then IMMEDIATELY quantized to integer
micros with the floor kernel ``FLOOR(d * 1e6 + 0.5)``. Every downstream
comparison — argmin for code assignment, reconstruction error, ADC
ranking — is integer arithmetic, so no ROUND-midpoint or fold-order
hazard exists anywhere in the operator.

Codebooks come in two flavors: deterministic corpus seeds (the first
``k_sub`` vectors by id, like similarity.ivf_centroids — the oracle
replay default), and TRAINED per-sub-space k-means codebooks
(``pq_fit`` / ``pq_topk_trained`` / ``pq_topk_ivf_residual_trained`` —
FAISS ProductQuantizer::train, with the same integer-exact kernels so
the trained results stay oracle-reproducible too). The plan shape,
code layout, and search path are identical either way; the recall is
not (see ``emb_pq_codebook_recall_report``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_gardener_spark.functions.localrel import local_df

from etl_gardener_spark.operators.similarity import ivf_centroids


def _sub_dist_e6(vec: Column, cvec: Column, start: int, width: int) -> Column:
    """Integer-micro squared-L2 distance between one sub-slice of ``vec``
    and the same slice of ``cvec``: left-to-right index-order double fold
    (bit-identical to the oracle's list_reduce over the same range), then
    the floor half-up kernel. 1-based ``start`` per F.slice semantics."""
    d = F.aggregate(
        F.zip_with(
            F.slice(vec, start, width),
            F.slice(cvec, start, width),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("long")


def _check_dim(vec_col: str, m: int, sub_dim: int) -> Column:
    """Fail-fast dimension guard (round-6 advisor fix): a vector shorter
    than ``m * sub_dim`` would make F.slice/zip_with pad with NULLs,
    feeding a NULL micro-distance into the min_by ordering — a silent,
    NULL-ordering-dependent code assignment. Executor-side assert_true
    turns the mis-sized input into an immediate, named failure instead
    (NULL vectors are left to the caller's null handling)."""
    need = m * sub_dim
    ok = F.col(vec_col).isNull() | (F.size(vec_col) >= need)
    return F.when(
        F.assert_true(
            ok,
            F.concat(
                F.lit(f"pq: embedding shorter than m*sub_dim={need}: got "),
                F.size(vec_col).cast("string"),
            ),
        ).isNull(),
        F.col(vec_col),
    )


def _codebook_df(
    corpus: DataFrame, id_col: str, vec_col: str, k_sub: int
) -> DataFrame:
    """Seeded codebook as a tiny broadcastable relation (cid, cvec).
    Explicit schema: an empty corpus yields zero seeds and inference
    cannot type an empty local relation (differential-fuzz, seed 0)."""
    cents = ivf_centroids(corpus, id_col, vec_col, n_centroids=k_sub)
    return local_df(
        corpus.sparkSession,
        [(cid, vec) for cid, vec in cents], "cid long, cvec array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """Encode every corpus vector to ``m`` PQ codes plus its exact-integer
    reconstruction error.

    Output: (id_col, code_0..code_{m-1} long, recon_err double) where
    recon_err is the sum of the chosen sub-space micro-distances / 1e6.
    One broadcast join (|corpus| x k_sub narrow rows) + one hash
    aggregate with ``m`` min_by's — map-side combined, no sort, no raw
    vector shuffle; the argmin tie-break is (distance_e6 ASC, cid ASC).

    ``codebook``: an explicit (cid, cvec) relation — the residual-PQ
    path passes a codebook seeded from residual vectors; None keeps the
    deterministic first-k_sub corpus seeding."""
    cb = (
        codebook
        if codebook is not None
        else _codebook_df(corpus, id_col, vec_col, k_sub)
    )
    scored = corpus.select(
        id_col, _check_dim(vec_col, m, sub_dim).alias(vec_col)
    ).join(F.broadcast(cb))
    for s in range(m):
        scored = scored.withColumn(
            f"__d{s}",
            _sub_dist_e6(F.col(vec_col), F.col("cvec"), s * sub_dim + 1, sub_dim),
        )
    aggs = []
    for s in range(m):
        ordk = F.struct(F.col(f"__d{s}").alias("d"), F.col("cid").alias("c"))
        val = F.struct(F.col("cid").alias("code"), F.col(f"__d{s}").alias("d"))
        aggs.append(F.min_by(val, ordk).alias(f"__m{s}"))
    out = scored.groupBy(id_col).agg(*aggs)
    err = sum((F.col(f"__m{s}.d") for s in range(m)), F.lit(0).cast("long"))
    return out.select(
        id_col,
        *[F.col(f"__m{s}.code").alias(f"code_{s}") for s in range(m)],
        (err.cast("double") / F.lit(1e6)).alias("recon_err"),
    )


def exploded_codes(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int,
    k_sub: int, codebook: DataFrame | None = None,
) -> DataFrame:
    """(neighbor_id, s, code): the encoded corpus melted to one row per
    sub-space — the relation ADC search actually reads (m small ints per
    vector; raw vectors never appear downstream of this)."""
    return (
        pq_encode(corpus, id_col, vec_col, m, sub_dim, k_sub, codebook)
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"code_{s}").alias("code"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("sc"),
        )
        .select("neighbor_id", "sc.s", "sc.code")
    )


def _query_dist_table(
    queries: DataFrame, cb: DataFrame, id_col: str, vec_col: str, m: int,
    sub_dim: int,
) -> DataFrame:
    """(query_id, code, s, de6): each query's m x k_sub micro-distance
    table — tiny, broadcast into the code join."""
    qd = queries.select(
        F.col(id_col).alias("query_id"),
        _check_dim(vec_col, m, sub_dim).alias("q_vec"),
    ).join(F.broadcast(cb))
    for s in range(m):
        qd = qd.withColumn(
            f"__d{s}",
            _sub_dist_e6(F.col("q_vec"), F.col("cvec"), s * sub_dim + 1, sub_dim),
        )
    return qd.select(
        "query_id",
        F.col("cid").alias("code"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"__d{s}").alias("de6"))
                    for s in range(m)
                ]
            )
        ).alias("sd"),
    ).select("query_id", "code", "sd.s", "sd.de6")


def _rank_adc(cand: DataFrame, k: int) -> DataFrame:
    """Top-k per query by (ADC score ASC, neighbor_id ASC)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    codes: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: rank corpus vectors by approximate (quantized) squared
    L2 distance to each query, touching only the corpus CODES.

    ``codes`` accepts a precomputed/persisted `exploded_codes` relation —
    a PQ index IS a materialized artifact, encoded once and searched
    many times; passing it skips the encode pass entirely.

    Output: (query_id, neighbor_id, score, rank) — score is the exact
    integer-micro ADC distance / 1e6, rank by (score ASC, neighbor_id
    ASC). The per-query m x k_sub distance table is a tiny broadcast;
    the corpus side is the exploded code relation (m rows per vector),
    so the heavy join is codes ⨝ table on (sub, code) — no raw corpus
    vectors move, which is the entire point of PQ at 100 TB.
    """
    cb = _codebook_df(corpus, id_col, vec_col, k_sub)
    if codes is None:
        codes = exploded_codes(corpus, id_col, vec_col, m, sub_dim, k_sub)
    table = _query_dist_table(queries, cb, id_col, vec_col, m, sub_dim)
    cand = (
        codes.join(F.broadcast(table), ["s", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("de6").cast("double") / F.lit(1e6)).alias("score"))
    )
    return _rank_adc(cand, k)


def pq_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    codes: DataFrame | None = None,
    centroids: DataFrame | None = None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IndexIVFPQ layout, ``by_residual=false``
    variant — codes encode raw vectors, not cell residuals, keeping
    every code oracle-reproducible): coarse cosine cells bound WHICH
    codes a query reads (~nprobe/C of the corpus via the cell
    equi-join), PQ codes bound HOW MUCH is read per vector (m bytes),
    and ADC ranks candidates without touching raw vectors at all.

    Build side (one corpus pass each, amortized across queries): cell
    assignment by rounded-cosine argmax (similarity.kmeans_assign —
    map-side-combined min_by, identical tie-break to the IVF-Flat
    oracle) and the PQ code table. Query side: nprobe nearest cells +
    the m x k_sub micro-distance table, both tiny broadcasts. Output:
    (query_id, neighbor_id, score, rank) — exact-integer ADC score,
    rank (score ASC, neighbor_id ASC).
    """
    from etl_gardener_spark.operators.similarity import (
        cosine,
        ivf_centroids,
        kmeans_assign,
    )

    spark = corpus.sparkSession
    if centroids is not None:
        # trained coarse quantizer (kmeans_fit's fitted relation) — the
        # same swap as similarity.cosine_topk_ivf's centroids param
        cents_df = centroids.select(
            F.col("cid").cast("long"), F.col("cvec").cast("array<double>")
        )
    else:
        cents = ivf_centroids(corpus, id_col, vec_col, n_centroids)
        cents_df = local_df(
            spark,
            [(cid, vec) for cid, vec in cents],
            "cid long, cvec array<double>",
        )
    if cells is None:
        cells = kmeans_assign(corpus, cents_df, id_col, vec_col).select(
            F.col(id_col).alias("neighbor_id"), F.col("cid").alias("cell")
        )
    else:
        # a persisted index's cell relation (index_store.load_ann_index,
        # or ivf_build_cells output) — extra columns like c_vec dropped
        cells = cells.select("neighbor_id", "cell")
    if codes is None:
        codes = exploded_codes(corpus, id_col, vec_col, m, sub_dim, k_sub)
    codes = codes.join(cells, "neighbor_id")

    qscored = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .join(F.broadcast(cents_df))
        .select(
            "query_id",
            "q_vec",
            F.col("cid").alias("cell"),
            F.round(
                F.coalesce(cosine(F.col("q_vec"), F.col("cvec")), F.lit(-2.0)),
                6,
            ).alias("__s"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("cell").asc()
    )
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "cell")
    )

    cb = _codebook_df(corpus, id_col, vec_col, k_sub)
    table = _query_dist_table(queries, cb, id_col, vec_col, m, sub_dim)
    cand = (
        codes.join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(table), ["query_id", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("de6").cast("double") / F.lit(1e6)).alias("score"))
    )
    return _rank_adc(cand, k)


def pq_topk_ivf_refined(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    refine_factor: int = 4,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    codes: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ search with an exact re-rank tail — the FAISS
    ``IndexRefineFlat`` production pattern: stage 1 runs the certified
    IVF-PQ search (`pq_topk_ivf`) for ``k * refine_factor`` candidates
    (cell-pruned scan, m-byte codes, integer ADC), stage 2 fetches ONLY
    those candidates' raw vectors and re-ranks by exact squared-L2 on
    the same per-sub-space integer-micro grid as `exact_l2_topk`, so
    the final ordering is immune to PQ quantization error among the
    survivors.

    Scale shape: the exact tail touches k·refine_factor raw vectors per
    query — a broadcast-joined point lookup, NOT a corpus scan; the
    corpus-bounded work stays inside the cell-pruned ADC stage. Recall
    is bounded by candidate-set coverage (nprobe and refine_factor are
    the levers); ordering among covered candidates is exact.

    Output: (query_id, neighbor_id, score, rank) — score is the EXACT
    integer-micro L2 / 1e6, rank by (score ASC, neighbor_id ASC).
    """
    cand = pq_topk_ivf(
        corpus,
        queries,
        id_col,
        vec_col,
        k=k * refine_factor,
        n_centroids=n_centroids,
        nprobe=nprobe,
        m=m,
        sub_dim=sub_dim,
        k_sub=k_sub,
        codes=codes,
        centroids=centroids,
    ).select("query_id", "neighbor_id")
    scored = cand.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        "neighbor_id",
    ).join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            )
        ),
        "query_id",
    )
    de6 = None
    for s in range(m):
        d = _sub_dist_e6(
            F.col("q_vec"), F.col("c_vec"), s * sub_dim + 1, sub_dim
        )
        de6 = d if de6 is None else de6 + d
    exact = scored.select(
        "query_id",
        "neighbor_id",
        (de6.cast("double") / F.lit(1e6)).alias("score"),
    )
    return _rank_adc(exact, k)


def exact_l2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    sub_dim: int = 16,
) -> DataFrame:
    """Exact top-k by squared L2 distance on the SAME per-sub-space
    integer-micro grid ADC uses (sum of m floor-quantized sub-distances
    of the TRUE sub-vectors) — the ground truth for PQ recall that
    compares like with like. Brute force: corpus scan x broadcast
    queries, one window per query group."""
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(
        F.broadcast(
            queries.select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
            )
        )
    ).filter(F.col("neighbor_id") != F.col("query_id"))
    de6 = None
    for s in range(m):
        d = _sub_dist_e6(
            F.col("q_vec"), F.col("c_vec"), s * sub_dim + 1, sub_dim
        )
        de6 = d if de6 is None else de6 + d
    cand = scored.select(
        "query_id",
        "neighbor_id",
        (de6.cast("double") / F.lit(1e6)).alias("score"),
    )
    return _rank_adc(cand, k)


def _residual_parts(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    sub_dim: int,
    n_centroids: int,
    nprobe: int,
    centroids: DataFrame | None,
):
    """Shared build of the residual IVF-PQ variants: (res, cells,
    probes) — the residual corpus relation (neighbor_id, cell, rvec),
    the cell assignment, and the per-query probe set carrying the query
    residual against each probed centroid. Lifted verbatim from the
    certified pq_topk_ivf_residual body so the seeded- and
    trained-codebook variants share one bit-identical front half."""
    from etl_gardener_spark.operators.similarity import (
        _resolve_cents,
        cosine,
        kmeans_assign,
    )

    cents_df = _resolve_cents(corpus, id_col, vec_col, n_centroids, centroids)
    cells = kmeans_assign(corpus, cents_df, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("cid").alias("cell")
    )
    res = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            _check_dim(vec_col, m, sub_dim).alias("__v"),
        )
        .join(cells, "neighbor_id")
        .join(
            F.broadcast(cents_df.withColumnRenamed("cid", "cell")), "cell"
        )
        .select(
            "neighbor_id",
            "cell",
            F.zip_with(
                F.col("__v"),
                F.col("cvec"),
                lambda x, y: x.cast("double") - y,
            ).alias("rvec"),
        )
        # one materialization, two consumers (codebook seed + encode)
        .localCheckpoint(eager=True)
    )
    qscored = (
        queries.select(
            F.col(id_col).alias("query_id"),
            _check_dim(vec_col, m, sub_dim).alias("q_vec"),
        )
        .join(F.broadcast(cents_df))
        .select(
            "query_id",
            "q_vec",
            F.col("cid").alias("cell"),
            "cvec",
            F.round(
                F.coalesce(cosine(F.col("q_vec"), F.col("cvec")), F.lit(-2.0)),
                6,
            ).alias("__s"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__s").desc(), F.col("cell").asc()
    )
    probes = (
        qscored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select(
            "query_id",
            "cell",
            F.zip_with(
                F.col("q_vec"), F.col("cvec"), lambda x, y: x.cast("double") - y
            ).alias("q_rvec"),
        )
    )
    return res, cells, probes


def pq_topk_ivf_residual(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding (``by_residual=true`` — the FAISS
    IndexIVFPQ default, completing the by_residual=false variant
    ``pq_topk_ivf``): each corpus vector is PQ-encoded as its residual
    x - c(cell) against its coarse centroid, and each query computes a
    SEPARATE ADC table per probed cell from its own residual q - c —
    residuals concentrate near zero, so a fixed codebook budget spends
    its resolution where the data actually lives, the whole reason the
    production layout encodes residuals.

    Same determinism discipline as the plain variant: residual
    subtraction is one elementwise double op (bit-identical in both
    engines); every distance is floored to integer micros before any
    comparison. The residual codebook is seeded from the first k_sub
    residual vectors by id (the codebook-seeding convention).

    **Production callers: use ``pq_topk_ivf_residual_trained``.** The
    id-based residual seeding here is kept for oracle replay, but it is
    DEGENERATE whenever the coarse quantizer was seeded from the same
    corpus prefix: the first k_sub vectors are their own centroids, so
    their residuals — the entire codebook — are zero vectors, one
    effective codeword, constant ADC scores (the measured 0.04 recall
    vs 0.26 trained in ``emb_pq_codebook_recall_report``).

    Scale shape: build = one corpus pass for cells + one for residual
    codes (both map-side-combined broadcast joins, no raw-vector
    shuffle); search reads codes for ~nprobe/C of the corpus via the
    cell equi-join, with an (nprobe x m x k_sub)-row per-query ADC
    table broadcast — per-cell tables are the only cost over the
    non-residual variant. Output: (query_id, neighbor_id, score, rank)
    — integer-exact ADC score, rank (score ASC, neighbor_id ASC).
    """
    # Each caller builds its own _residual_parts triple: the r11 A/B
    # measured that sharing one triple across the codebook report's two
    # residual arms SERIALIZES the front half ahead of the arm fan-out
    # and loses (task 8.62→10.96 s) — duplicate front halves that
    # overlap on idle cores are free in wall terms (guide §2.6), so the
    # former ``parts=`` sharing hook was dropped (r11 advisor: no caller).
    res, cells, probes = _residual_parts(
        corpus, queries, id_col, vec_col, m, sub_dim, n_centroids,
        nprobe, centroids,
    )
    rcb = _codebook_df(res, "neighbor_id", "rvec", k_sub)
    codes = exploded_codes(
        res, "neighbor_id", "rvec", m, sub_dim, k_sub, codebook=rcb
    ).join(cells, "neighbor_id")
    # per-(query, probed cell) ADC table: (query_id, cell, s, code, de6)
    qd = probes.join(F.broadcast(rcb))
    for s in range(m):
        qd = qd.withColumn(
            f"__d{s}",
            _sub_dist_e6(F.col("q_rvec"), F.col("cvec"), s * sub_dim + 1, sub_dim),
        )
    qd = qd.select(
        "query_id",
        "cell",
        F.col("cid").alias("code"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("s"), F.col(f"__d{s}").alias("de6"))
                    for s in range(m)
                ]
            )
        ).alias("sd"),
    ).select("query_id", "cell", "code", "sd.s", "sd.de6")

    cand = (
        probes.select("query_id", "cell")
        .join(codes, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = (
        cand.join(F.broadcast(qd), ["query_id", "cell", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("de6").cast("double") / F.lit(1e6)).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").asc(), F.col("neighbor_id").asc()
    )
    return (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


# -- trained sub-quantizer codebooks (r9 verdict item 2) ------------------
#
# The seeded codebooks above keep every result oracle-reproducible, but
# FAISS trains PQ codebooks with per-sub-space k-means (Jegou et al. §III;
# faiss/ProductQuantizer train) — and the r9 recall instrument measured
# exactly the gap that seeding leaves: residual-encoded PQ at 0.04 recall
# vs 0.18 plain on a corpus where the residual-seeded first-k codebook
# has no reason to cover the residual distribution. The functions below
# supply the trained path with the SAME determinism discipline: seeds are
# the first k_sub sub-slices by id, assignment argmin is on the
# integer-micro grid with the (de6 ASC, cid ASC) tie-break, and the Lloyd
# update is the element-wise mean ROUND(·, 6) — the kmeans_fit kernel —
# so a DuckDB CTE chain reproduces every codebook entry bit-exactly.


def melt_subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int
) -> DataFrame:
    """(id_col, s, svec): each vector melted to its m sub-slices — the
    relation per-sub-space training and encoding both scan. One narrow
    projection; m rows of sub_dim doubles per vector."""
    return df.select(
        id_col, _check_dim(vec_col, m, sub_dim).alias("__v")
    ).select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(F.col("__v"), s * sub_dim + 1, sub_dim).alias(
                            "svec"
                        ),
                    )
                    for s in range(m)
                ]
            )
        ).alias("ss"),
    ).select(id_col, "ss.s", "ss.svec")


def _svec_dist_e6(a: Column, b: Column) -> Column:
    """Integer-micro squared-L2 over two whole sub-vectors (the
    _sub_dist_e6 kernel at slice offset 0)."""
    d = F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("long")


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
) -> DataFrame:
    """Train per-sub-space PQ codebooks (FAISS ProductQuantizer::train):
    k_sub-means over each sub-space's slice distribution, all m
    sub-spaces trained in ONE Spark program per Lloyd iteration (the
    sub-space id is just another group key — no per-sub-space driver
    loop). Returns the codebook relation (s, cid, cvec<sub_dim>).

    Seeds: per sub-space, the first k_sub DISTINCT sub-vectors by
    min-id, renumbered cid = 0..k_sub-1 in that order. Distinctness is
    load-bearing, not cosmetic: on RESIDUAL corpora the first k_sub ids
    are exactly the seeded coarse centroids, whose residuals are all
    the ZERO vector — id-based seeding hands Lloyd k_sub identical
    codewords and the tie-break collapses every assignment to cid 0
    (one codeword, constant ADC scores — the degenerate codebook behind
    the r9 instrument's 0.04 residual recall). Assignment:
    integer-micro argmin, (de6 ASC, cid ASC) tie-break. Update:
    element-wise INTEGER-MICRO mean — components quantized to the
    1e-6 grid with the floor kernel, summed as exact int64 (an
    order-independent fold, unlike a double AVG whose fold order can
    flip ROUND's last digit between engines — residual corpora hit
    exactly that at sf0.01), then one deterministic half-up division.
    Empty codewords drop out (Lloyd's standard degenerate case).

    Scale: each iteration is one melted-corpus scan (m rows/vector)
    broadcast-joined to the m*k_sub codebook rows and folded by a
    map-side-combined min_by, then one positional-mean aggregate —
    O(n*m*k_sub) work, no raw-vector shuffle; k-means on PQ sub-spaces
    is conventionally run on a bounded SAMPLE of the corpus (FAISS
    defaults to ~256 vectors/centroid) — pass such a sample as
    ``corpus`` for the 100 TB fit."""
    subs = melt_subvectors(corpus, id_col, vec_col, m, sub_dim)
    # min-id per distinct sub-vector: ids partition across groups, so
    # the mids are unique within a sub-space — the rank is deterministic
    ws = Window.partitionBy("s").orderBy("mid")
    cb = (
        subs.groupBy("s", "svec")
        .agg(F.min(id_col).alias("mid"))
        .withColumn("__rk", F.row_number().over(ws))
        .filter(F.col("__rk") <= k_sub)
        .select(
            "s",
            (F.col("__rk") - 1).cast("long").alias("cid"),
            F.col("svec").alias("cvec"),
        )
    )
    if n_iter > 0:
        # training scans subs repeatedly — pin it once
        subs = subs.localCheckpoint(eager=True)
    for _ in range(n_iter):
        scored = subs.join(F.broadcast(cb), "s").withColumn(
            "__d", _svec_dist_e6(F.col("svec"), F.col("cvec"))
        )
        # the sub-vector rides THROUGH the argmin aggregate (F.first over
        # the k_sub identical copies the broadcast join replicates), so
        # the update below needs no join-back shuffle of the melted
        # corpus — one exchange per Lloyd iteration instead of two
        # (the kmeans_fit fusion, guide §2.4); (id, s) is unique in subs,
        # so first(svec) is the row's own slice, not a choice.
        assigned = scored.groupBy(id_col, "s").agg(
            F.min_by(
                F.col("cid"),
                F.struct(F.col("__d").alias("d"), F.col("cid").alias("c")),
            ).alias("cid"),
            F.first("svec").alias("svec"),
        )
        exploded = assigned.select(
            "s", "cid", F.posexplode("svec").alias("pos", "val")
        )
        # the updated codebook is O(m·k_sub·sub_dim) values — collect the
        # per-(s, cid, pos) integer-micro means and re-embed them as a
        # local relation (the kmeans_fit pattern): a lazy localCheckpoint
        # of an AQE plan still force-runs every intermediate stage
        # serially via toRdd, and each later consumer pays a
        # broadcast-build job, while a LocalTableScan broadcasts without
        # scheduling anything. Values are bit-identical — the distributed
        # aggregate is unchanged and the driver only reassembles its rows
        # into pos-ordered arrays, exactly what the former
        # array_sort(collect_list(struct)) tail did (pos is unique per
        # (s, cid), so the orders coincide).
        mrows = (
            exploded.groupBy("s", "cid", "pos")
            .agg(
                F.sum(
                    F.floor(
                        F.col("val").cast("double") * F.lit(1e6) + F.lit(0.5)
                    ).cast("long")
                ).alias("se6"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "s",
                "cid",
                "pos",
                (
                    F.floor(
                        F.col("se6").cast("double") / F.col("n") + F.lit(0.5)
                    ).cast("long").cast("double")
                    / F.lit(1e6)
                ).alias("mv"),
            )
            .collect()
        )
        by_key: dict[tuple[int, int], list[tuple[int, float | None]]] = {}
        for r in mrows:
            by_key.setdefault((int(r[0]), int(r[1])), []).append(
                (int(r[2]), None if r[3] is None else float(r[3]))
            )
        cb = local_df(
            corpus.sparkSession,
            [
                (s, cid, [mv for _, mv in sorted(vals)])
                for (s, cid), vals in sorted(by_key.items())
            ],
            # s stays INT (the seed's F.lit(s) type), cid long, mv double
            # — the exact schema the former aggregate tail produced
            "s int, cid long, cvec array<double>",
        )
    return cb


def exploded_codes_sub(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    sub_dim: int,
    codebooks: DataFrame,
) -> DataFrame:
    """(neighbor_id, s, code, de6): encode against per-sub-space
    codebooks (pq_fit's relation) — the trained twin of exploded_codes.
    One melted scan, broadcast codebook join, map-side-combined min_by;
    de6 is the chosen sub-distance (reconstruction-error term)."""
    scored = melt_subvectors(corpus, id_col, vec_col, m, sub_dim).join(
        F.broadcast(codebooks), "s"
    ).withColumn("__d", _svec_dist_e6(F.col("svec"), F.col("cvec")))
    return scored.groupBy(F.col(id_col).alias("neighbor_id"), F.col("s")).agg(
        F.min_by(
            F.struct(F.col("cid").alias("code"), F.col("__d").alias("de6")),
            F.struct(F.col("__d").alias("d"), F.col("cid").alias("c")),
        ).alias("mc")
    ).select("neighbor_id", "s", "mc.code", "mc.de6")


def _query_dist_table_sub(
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    m: int,
    sub_dim: int,
) -> DataFrame:
    """(query_id, s, code, de6): the per-query ADC table against trained
    codebooks — m x k_sub rows per query, tiny, broadcast downstream."""
    return (
        melt_subvectors(queries, id_col, vec_col, m, sub_dim)
        .select(F.col(id_col).alias("query_id"), "s", "svec")
        .join(F.broadcast(codebooks), "s")
        .select(
            "query_id",
            "s",
            F.col("cid").alias("code"),
            _svec_dist_e6(F.col("svec"), F.col("cvec")).alias("de6"),
        )
    )


def pq_topk_trained(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over TRAINED codebooks: pq_topk's exact search body
    (codes ⨝ broadcast table on (s, code), integer-micro ADC sum, rank
    by (score ASC, neighbor_id ASC)) with pq_fit's per-sub-space
    codebooks in place of the seeded ones. ``codebooks`` accepts a
    persisted pq_fit relation — fit once, search many."""
    cb = (
        codebooks
        if codebooks is not None
        else pq_fit(corpus, id_col, vec_col, m, sub_dim, k_sub, n_iter)
    )
    codes = exploded_codes_sub(corpus, id_col, vec_col, m, sub_dim, cb)
    table = _query_dist_table_sub(queries, cb, id_col, vec_col, m, sub_dim)
    cand = (
        codes.select("neighbor_id", "s", "code")
        .join(F.broadcast(table), ["s", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("de6").cast("double") / F.lit(1e6)).alias("score"))
    )
    return _rank_adc(cand, k)


def pq_topk_ivf_residual_trained(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Residual IVF-PQ with a TRAINED sub-quantizer codebook — the full
    FAISS-faithful IndexIVFPQ composition (by_residual=true AND
    ProductQuantizer::train): pq_topk_ivf_residual's exact front half
    (_residual_parts — cells, residuals, per-probe query residuals),
    with pq_fit's per-sub-space k-means codebook trained ON the
    residual distribution replacing the residual-seeded first-k one.
    The r9 recall instrument attributed residual PQ's 0.04-vs-0.18
    recall loss to that seeded codebook; this is the trained fix it
    called for.

    ``codebooks``: a persisted pq_fit relation over the residuals —
    fit once, search many (pair with operators/index_store).
    Output: (query_id, neighbor_id, score, rank), integer-exact ADC.
    """
    res, cells, probes = _residual_parts(
        corpus, queries, id_col, vec_col, m, sub_dim, n_centroids,
        nprobe, centroids,
    )
    rcb = (
        codebooks
        if codebooks is not None
        else pq_fit(res, "neighbor_id", "rvec", m, sub_dim, k_sub, n_iter)
    )
    codes = exploded_codes_sub(
        res, "neighbor_id", "rvec", m, sub_dim, rcb
    ).join(cells, "neighbor_id")

    # per-(query, probed cell) ADC table from the query residuals
    qd = (
        probes.select(
            "query_id",
            "cell",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.slice(
                                F.col("q_rvec"), s * sub_dim + 1, sub_dim
                            ).alias("svec"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("ss"),
        )
        .select("query_id", "cell", "ss.s", "ss.svec")
        .join(F.broadcast(rcb), "s")
        .select(
            "query_id",
            "cell",
            "s",
            F.col("cid").alias("code"),
            _svec_dist_e6(F.col("svec"), F.col("cvec")).alias("de6"),
        )
    )

    cand = (
        probes.select("query_id", "cell")
        .join(codes.select("neighbor_id", "cell", "s", "code"), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    adc = (
        cand.join(F.broadcast(qd), ["query_id", "cell", "s", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg((F.sum("de6").cast("double") / F.lit(1e6)).alias("score"))
    )
    return _rank_adc(adc, k)


def hadamard_rotate(
    df: DataFrame,
    vec_col: str,
    dim: int,
    out_col: str | None = None,
    method: str = "npfold",
) -> DataFrame:
    """Rotate vectors by the normalized Hadamard matrix H_dim/sqrt(dim)
    (``dim`` must be a power of two): y_i = sum_j (-1)^popcount(i & j)
    * x_j / sqrt(dim). The deterministic, SQL-expressible stand-in for
    the random orthogonal rotation FAISS applies before PQ (OPQ /
    "PCAR" energy balancing): a Hadamard rotation mixes every input
    coordinate into every output coordinate with equal weight, so
    per-dimension variance spreads evenly across the PQ sub-spaces
    instead of concentrating in whichever sub-space holds the
    high-variance dims. Orthogonal => exact L2 distances are preserved
    ([[emb_pq_hadamard_recall_report]] relies on this: the rotated
    exact top-k IS the raw exact top-k).

    Exactness: for power-of-4... rather, for dim a power of two whose
    sqrt is exact in binary (dim = 4^k, e.g. 64: 1/sqrt(64) = 0.125),
    the scaling is a float-EXACT multiply, and the inner sum is a
    left-assoc fold both engines reproduce bit-for-bit (init 0.0 + t0
    == t0 exactly in IEEE). Oracle mirror: nested list_transform /
    list_reduce over bit_count(i & j) parity.

    Scale shape (``method``): 'npfold' (default) evaluates the SAME
    left-assoc IEEE fold as the SQL kernel in numpy — exact ±x_j terms
    (H entries are ±1), np.cumsum's strictly sequential accumulate
    reproduces the fold addition-by-addition, and the 1/sqrt(dim) scale
    is float-exact for dim = 4^k — so it is BIT-IDENTICAL to 'sql'
    (pinned by tests/test_pq_rrf.py::test_hadamard_npfold_bit_equal)
    at ~10x less task time: the nested-lambda tree runs interpreted
    (higher-order functions take no codegen), ~1.7 task-s per sf0.1
    corpus rotation vs ~0.2. 'sql' is the certified oracle-reference
    expression tree (the DuckDB mirror is its literal transliteration);
    'fwht' is the O(dim log dim) fast Walsh-Hadamard butterfly — the
    100 TB path for embedding dims 768-4096 where the quadratic kernel
    is ~100-4000x more flops. All three compute the SAME transform
    (Sylvester ordering: H[i,j] = (-1)^popcount(i&j)); fwht differs
    only in float summation ORDER (pairwise butterfly vs sequential
    fold), so it is allclose-but-not-bit-equal — keep 'sql'/'npfold'
    wherever an oracle replays the fold (tests/test_pq_rrf.py pins
    fwht allclose + identical downstream top-k at dim 64, and the sf
    ladder records the crossover at dim 512).
    """
    if dim & (dim - 1):
        raise ValueError(f"dim={dim} must be a power of two")
    if method not in ("sql", "fwht", "npfold"):
        raise ValueError(
            f"method must be 'sql', 'fwht' or 'npfold', got {method!r}"
        )
    scale = 1.0 / (dim ** 0.5)
    out = out_col or vec_col
    if method == "fwht":
        return _hadamard_rotate_fwht(df, vec_col, dim, out, scale)
    if method == "npfold":
        return _hadamard_rotate_npfold(df, vec_col, dim, out, scale)
    # r10 advisor fix: rotating only the first ``dim`` components would
    # silently TRUNCATE a longer vector, and a shorter one would fold
    # NULLs (element_at out-of-bounds) into every output component.
    # assert exact length executor-side (NULL vectors pass through).
    size_ok = F.col(vec_col).isNull() | (F.size(vec_col) == dim)
    x = F.when(
        F.assert_true(
            size_ok,
            F.concat(
                F.lit(f"hadamard_rotate: vector length != dim={dim}: got "),
                F.size(vec_col).cast("string"),
            ),
        ).isNull(),
        F.col(vec_col),
    )
    rotated = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.when(
                F.bit_count(i.cast("long").bitwiseAND(j.cast("long"))) % 2
                == 0,
                F.element_at(x, (j + 1).cast("int")).cast("double"),
            ).otherwise(
                -F.element_at(x, (j + 1).cast("int")).cast("double")
            ),
        )
        * F.lit(scale),
    )
    return df.withColumn(out, rotated)


def _hadamard_rotate_fwht(
    df: DataFrame, vec_col: str, dim: int, out: str, scale: float
) -> DataFrame:
    """The O(dim log dim) butterfly: per Arrow batch, log2(dim)
    vectorized (x+y, x-y) passes over a (rows, dim) float64 matrix —
    pure per-row map (no shuffle), all other columns pass through.
    NULL vectors yield NULL outputs (the SQL kernel's all-NULL
    components collapse to NULL here — callers treat both as
    unscorable); a non-NULL vector whose length differs from ``dim``
    raises, matching the SQL kernel's executor-side assert."""
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    in_fields = list(df.schema.fields)
    names = [f.name for f in in_fields]
    out_field = StructField(out, ArrayType(DoubleType()))
    if out in names:
        fields = [out_field if f.name == out else f for f in in_fields]
    else:
        fields = in_fields + [out_field]
    out_schema = StructType(fields)
    out_names = [f.name for f in fields]

    def gen(batches):
        for pdf in batches:
            res: list = [None] * len(pdf)
            mask = pdf[vec_col].notna()
            if mask.any():
                vecs = [list(v) for v in pdf[vec_col][mask]]
                bad = {len(v) for v in vecs} - {dim}
                if bad:
                    raise ValueError(
                        f"hadamard_rotate: vector length != dim={dim}: "
                        f"got {sorted(bad)}"
                    )
                mat = np.array(vecs, dtype=np.float64)
                n_rows = mat.shape[0]
                h = 1
                while h < dim:
                    m = mat.reshape(n_rows, dim // (2 * h), 2, h)
                    x, y = m[:, :, 0, :], m[:, :, 1, :]
                    mat = np.stack((x + y, x - y), axis=2).reshape(
                        n_rows, dim
                    )
                    h *= 2
                mat *= scale
                for r, i in enumerate(np.nonzero(mask.to_numpy())[0]):
                    res[int(i)] = mat[r].tolist()
            out_pdf = pdf.copy()
            out_pdf[out] = res
            yield out_pdf[out_names]

    return df.mapInPandas(gen, schema=out_schema)


def _hadamard_rotate_npfold(
    df: DataFrame, vec_col: str, dim: int, out: str, scale: float
) -> DataFrame:
    """BIT-EXACT numpy twin of the SQL kernel: y_i = (fold_j acc ± x_j)
    * scale with the identical left-assoc IEEE addition order — each
    term ±x_j is an exact sign flip (H entries are ±1), np.cumsum is a
    strictly sequential accumulate (no pairwise re-association), the
    fold's 0.0 + t0 == t0 start coincides with cumsum's first element,
    and the final * scale is float-exact for dim = 4^k. Per Arrow
    batch, rows fold in (rows, dim, dim)-term chunks bounded to ~8 MB.

    Null semantics mirror the expression tree exactly: a NULL vector —
    or any NULL component, since H has no zero entries so every output
    folds every input — yields an array of ``dim`` NULL components
    (NOT a NULL array: the transform runs over sequence(0, dim-1));
    a non-NULL vector of the wrong length raises, matching the SQL
    kernel's executor-side assert. mapInArrow, not mapInPandas: the
    Arrow<->pandas conversion renders NULL list components and NaN
    identically, erasing a distinction the fold's output preserves
    ([null]*dim vs [nan]*dim); Arrow batches round-trip both exactly."""
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    in_fields = list(df.schema.fields)
    names = [f.name for f in in_fields]
    out_field = StructField(out, ArrayType(DoubleType()))
    if out in names:
        fields = [out_field if f.name == out else f for f in in_fields]
    else:
        fields = in_fields + [out_field]
    out_schema = StructType(fields)
    out_names = [f.name for f in fields]
    all_null = [None] * dim

    def gen(batches):
        import pyarrow as pa

        ii = np.arange(dim, dtype=np.int64)
        parity = np.zeros((dim, dim), dtype=np.int64)
        anded = ii[:, None] & ii[None, :]
        while anded.any():
            parity ^= anded & 1
            anded >>= 1
        sign = np.where(parity == 0, 1.0, -1.0)
        chunk = max(1, (8 << 20) // (dim * dim * 8))
        list_t = pa.list_(pa.float64())
        for batch in batches:
            cols = {n: batch.column(i) for i, n in enumerate(batch.schema.names)}
            vals = cols[vec_col].to_pylist()  # None/NaN preserved exactly
            res: list = [None] * len(vals)
            clean_idx, clean_vecs, bad = [], [], set()
            for i, v in enumerate(vals):
                if v is None:
                    res[i] = all_null
                    continue
                if len(v) != dim:
                    bad.add(len(v))
                elif any(c is None for c in v):
                    # a NULL component poisons every fold (H has no
                    # zero entries) -> dim NULL components, like SQL
                    res[i] = all_null
                else:
                    clean_idx.append(i)
                    clean_vecs.append(v)
            if bad:
                raise ValueError(
                    f"hadamard_rotate: vector length != dim={dim}: "
                    f"got {sorted(bad)}"
                )
            if clean_vecs:
                mat = np.array(clean_vecs, dtype=np.float64)
                for s in range(0, mat.shape[0], chunk):
                    blk = mat[s : s + chunk]
                    terms = sign[None, :, :] * blk[:, None, :]
                    y = np.cumsum(terms, axis=2)[:, :, -1] * scale
                    for r in range(blk.shape[0]):
                        res[clean_idx[s + r]] = y[r].tolist()
            out_arr = pa.array(res, type=list_t)
            arrays = [
                out_arr if n == out else cols[n] for n in out_names
            ]
            yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return df.mapInArrow(gen, schema=out_schema)


# -- OPQ: learned rotation via integer-micro Newton-Schulz polar ----------


def _identity_e6(dim: int) -> list[list[int]]:
    return [
        [1_000_000 if i == j else 0 for j in range(dim)] for i in range(dim)
    ]


def _ns_polar_e6(scatter_sums, cnt: int, dim: int, ns_iter: int):
    """Orthogonal (Procrustes) factor of the scatter matrix in EXACT
    integer-micro arithmetic: R = polar(M) = UV^T for M = USV^T, computed
    WITHOUT an SVD so a SQL oracle can replay it bit-for-bit — mean the
    exact int64 scatter sums, normalize by the Frobenius norm (spectral
    <= Frobenius, so every singular value lands in NS's (0, sqrt(3))
    convergence basin), then ``ns_iter`` Newton-Schulz steps
    Y <- 1.5*Y - 0.5*Y*Y^T*Y. Every matrix lives on the 1e-6 grid as
    int64; every product/sum is exact; every re-quantization is the
    same FLOOR(CAST(int AS DOUBLE)/div + 0.5) kernel the DuckDB mirror
    writes, so driver-numpy and oracle-SQL produce IDENTICAL matrices.
    A zero scatter (empty/degenerate sample) falls back to identity."""
    import numpy as np

    if cnt <= 0:
        return _identity_e6(dim)
    s = np.asarray(scatter_sums, dtype=np.int64)
    mbar = np.floor(
        s.astype(np.float64) / (float(cnt) * 1e6) + 0.5
    ).astype(np.int64)
    import math

    ss = int((mbar.astype(object) ** 2).sum())  # exact: entries ~1e6
    fro = int(np.floor(math.sqrt(float(ss)) + 0.5))  # IEEE sqrt == SQL SQRT
    if fro == 0:
        return _identity_e6(dim)
    y = np.floor(
        mbar.astype(np.float64) * 1e6 / float(fro) + 0.5
    ).astype(np.int64)
    # identity-shift regularization: the scatter of a PQ reconstruction
    # is near-symmetric-PSD with EXACT zeros along data-free directions
    # (piecewise-constant Yhat), and NS cannot lift a zero singular
    # value — the polar factor there is arbitrary anyway, so bias the
    # completion toward identity with sigma_min >~ 0.01, well inside
    # the (0, sqrt(3)) basin and converged by ~16 of the iterations.
    y = y + 10_000 * np.eye(y.shape[0], dtype=np.int64)
    for _ in range(ns_iter):
        assert int(np.abs(y).max()) < (1 << 22), "NS iterate out of bounds"
        z = np.floor(
            (y @ y.T).astype(np.float64) / 1e6 + 0.5
        ).astype(np.int64)
        w = np.floor(
            (z @ y).astype(np.float64) / 1e6 + 0.5
        ).astype(np.int64)
        y = np.floor(
            (3 * y - w).astype(np.float64) / 2.0 + 0.5
        ).astype(np.int64)
    return [[int(v) for v in row] for row in y]


def opq_rotate(
    df: DataFrame,
    vec_col: str,
    r_e6: list[list[int]],
    dim: int,
    out_col: str | None = None,
    method: str = "gemm",
) -> DataFrame:
    """Apply a learned micro-grid rotation: y[j] = sum_i x[i]*R[i][j],
    computed ENTIRELY in exact int64 micros — x quantized to the 1e-6
    grid, int64 products, exact sums (order-independent, so there is no
    fold-order hazard anywhere), one half-up re-quantization — then
    scaled back to double. NULL vectors pass through as NULL; length is
    the CALLER's contract (pq_topk_opq filters len == dim, mirroring
    its oracle's WHERE).

    ``method``: 'gemm' (default) computes the same integer math as an
    Arrow-batched numpy int64 matmul in mapInPandas; 'sql' is the
    literal expression-tree mirror of the DuckDB oracle's relational
    kernel. The two are BIT-IDENTICAL (unlike the fwht float path)
    because every operation is exact int64 — which is why gemm can be
    the default on a certified path: tests/test_pq_rrf.py pins the
    equality. 'sql' exists as the readable oracle reference but is NOT
    the hot path — the nested element_at on a broadcast 64x64 array
    column falls out of whole-stage codegen (measured 514 s vs <1 s
    for 20k rows x dim 64). Both are pure per-row maps: no shuffle."""
    if method not in ("sql", "gemm"):
        raise ValueError(f"method must be 'sql' or 'gemm', got {method!r}")
    out = out_col or vec_col
    if method == "gemm":
        return _opq_rotate_gemm(df, vec_col, r_e6, dim, out)
    spark = df.sparkSession
    rdf = local_df(spark, [(r_e6,)], "__opq_r array<array<long>>")
    # executor-side length assert (the hadamard_rotate r10-advisor
    # contract): a shorter vector would fold element_at NULLs into
    # every output component, a longer one would silently truncate
    ok = F.col(vec_col).isNull() | (F.size(vec_col) == F.lit(dim))
    checked = F.when(
        F.assert_true(
            ok,
            F.concat(
                F.lit(f"opq_rotate: vector length != dim={dim}: got "),
                F.size(vec_col).cast("string"),
            ),
        ).isNull(),
        F.col(vec_col),
    )
    xm = F.transform(
        checked,
        lambda v: F.floor(v.cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
            "long"
        ),
    )
    df2 = df.crossJoin(F.broadcast(rdf)).withColumn("__xm", xm)
    rotated = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.floor(
            F.aggregate(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                F.lit(0).cast("long"),
                lambda acc, i: acc
                + F.element_at(F.col("__xm"), i + 1)
                * F.element_at(
                    F.element_at(F.col("__opq_r"), i + 1), j + 1
                ),
            ).cast("double")
            / F.lit(1e6)
            + F.lit(0.5)
        ).cast("long").cast("double")
        / F.lit(1e6),
    )
    return df2.withColumn(
        out, F.when(F.col(vec_col).isNotNull(), rotated)
    ).drop("__xm", "__opq_r")


def _opq_rotate_gemm(
    df: DataFrame, vec_col: str, r_e6: list[list[int]], dim: int, out: str
) -> DataFrame:
    """numpy int64 twin of the SQL rotation kernel — exact integer
    matmul + the identical floor-half-up double re-quantization, so the
    two methods agree bit-for-bit."""
    import numpy as np

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    r_mat = np.asarray(r_e6, dtype=np.int64)
    in_fields = list(df.schema.fields)
    out_field = StructField(out, ArrayType(DoubleType()))
    names = [f.name for f in in_fields]
    if out in names:
        fields = [out_field if f.name == out else f for f in in_fields]
    else:
        fields = in_fields + [out_field]
    out_schema = StructType(fields)
    out_names = [f.name for f in fields]

    def gen(batches):
        for pdf in batches:
            res: list = [None] * len(pdf)
            mask = pdf[vec_col].notna()
            if mask.any():
                vecs = [list(v) for v in pdf[vec_col][mask]]
                bad = {len(v) for v in vecs} - {len(r_mat)}
                if bad:
                    raise ValueError(
                        f"opq_rotate: vector length != dim="
                        f"{len(r_mat)}: got {sorted(bad)}"
                    )
                xm = np.floor(
                    np.array(vecs, dtype=np.float64) * 1e6 + 0.5
                ).astype(np.int64)
                ym = np.floor(
                    (xm @ r_mat).astype(np.float64) / 1e6 + 0.5
                ).astype(np.int64)
                rot = ym.astype(np.float64) / 1e6
                for r, i in enumerate(np.nonzero(mask.to_numpy())[0]):
                    res[int(i)] = rot[r].tolist()
            out_pdf = pdf.copy()
            out_pdf[out] = res
            yield out_pdf[out_names]

    return df.mapInPandas(gen, schema=out_schema)


def _pq_group_key(svec) -> tuple:
    """Grouping key with Spark's aggregate-key float semantics: -0.0
    groups with 0.0 and all NaNs group together (Catalyst normalizes
    both before hashing group keys)."""
    out = []
    for v in svec:
        f = float(v)
        if f != f:
            out.append("nan")
        else:
            out.append(0.0 if f == 0.0 else f)
    return tuple(out)


def _svec_dist_e6_local(x, y) -> int:
    """Driver twin of _svec_dist_e6: identical left-to-right IEEE double
    fold of squared differences, identical floor half-up micro cast.
    Python floats ARE IEEE doubles, so each op is bit-identical."""
    import math

    acc = 0.0
    for a, b in zip(x, y):
        d = float(a) - float(b)
        acc = acc + d * d
    return int(math.floor(acc * 1e6 + 0.5))


def _pq_fit_local(
    rows: list[tuple[int, list[float]]],
    m: int,
    sub_dim: int,
    k_sub: int,
    n_iter: int,
) -> dict[int, list[tuple[int, list[float]]]]:
    """Driver-side exact replica of :func:`pq_fit` for an ALREADY
    COLLECTED, bounded sample (the opq_fit alternation trains on the
    id-bounded sample per FAISS convention, and opq_fit collects that
    sample anyway for the scatter) — same seeding (first k_sub distinct
    sub-vectors by min id), same integer-micro argmin with (d, cid)
    tie-break, same exact-int64-sum half-up-mean update, same empty-
    codeword dropout. Running it on the driver replaces ~4 scheduler
    round-trips per Lloyd iteration with zero; bit-equality with the
    distributed kernel is pinned by
    tests/test_pq_rrf.py::test_pq_fit_local_matches_spark.

    Returns {s: [(cid, cvec), ...]} sorted by cid within each s."""
    import math

    melted: list[tuple[int, int, list[float]]] = []
    for sid, vec in rows:
        if vec is None:
            continue
        if len(vec) < m * sub_dim:
            raise ValueError(
                f"pq: embedding shorter than m*sub_dim={m * sub_dim}: "
                f"got {len(vec)}"
            )
        for s in range(m):
            raw = vec[s * sub_dim : (s + 1) * sub_dim]
            if any(v is None for v in raw):
                raise ValueError("pq: NULL vector component in fit sample")
            melted.append((sid, s, [float(v) for v in raw]))
    # seed: per sub-space, min id per DISTINCT sub-vector, first k_sub
    # by that min id, renumbered 0..k_sub-1 (pq_fit's window rank)
    distinct: dict[tuple, tuple[int, list[float]]] = {}
    for sid, s, sv in melted:
        key = (s, _pq_group_key(sv))
        cur = distinct.get(key)
        if cur is None or sid < cur[0]:
            distinct[key] = (sid, sv)
    per_s: dict[int, list[tuple[int, list[float]]]] = {}
    for (s, _k), (mid, sv) in distinct.items():
        per_s.setdefault(s, []).append((mid, sv))
    cb: dict[int, list[tuple[int, list[float]]]] = {}
    for s, lst in per_s.items():
        lst.sort(key=lambda t: t[0])
        cb[s] = [(cid, sv) for cid, (_mid, sv) in enumerate(lst[:k_sub])]
    for _ in range(n_iter):
        # assignment: integer-micro argmin, (de6 ASC, cid ASC) tie-break
        sums: dict[tuple[int, int, int], list[int]] = {}
        for sid, s, sv in melted:
            best = None
            for cid, cvec in cb.get(s, []):
                key = (_svec_dist_e6_local(sv, cvec), cid)
                if best is None or key < best:
                    best = key
            if best is None:
                continue
            cid = best[1]
            for pos, val in enumerate(sv):
                e6 = int(math.floor(val * 1e6 + 0.5))
                acc = sums.get((s, cid, pos))
                if acc is None:
                    sums[(s, cid, pos)] = [e6, 1]
                else:
                    acc[0] += e6
                    acc[1] += 1
        by_key: dict[tuple[int, int], list[tuple[int, float]]] = {}
        for (s, cid, pos), (se6, n) in sums.items():
            mv = float(int(math.floor(float(se6) / n + 0.5))) / 1e6
            by_key.setdefault((s, cid), []).append((pos, mv))
        cb = {}
        for (s, cid), vals in sorted(by_key.items()):
            cb.setdefault(s, []).append(
                (cid, [mv for _pos, mv in sorted(vals)])
            )
    return cb


def _pq_encode_local(
    rows: list[tuple[int, list[float]]],
    cb: dict[int, list[tuple[int, list[float]]]],
    m: int,
    sub_dim: int,
) -> dict[int, list[float]]:
    """Driver twin of exploded_codes_sub + the opq_fit reconstruction
    tail: per (id, sub-space) integer-micro argmin against the trained
    codebook, yhat = the chosen codewords concatenated in sub-space
    order. Returns {sid: yhat}."""
    out: dict[int, list[float]] = {}
    for sid, vec in rows:
        if vec is None:
            continue
        yhat: list[float] = []
        for s in range(m):
            sv = [float(v) for v in vec[s * sub_dim : (s + 1) * sub_dim]]
            best = None
            best_cvec = None
            for cid, cvec in cb.get(s, []):
                key = (_svec_dist_e6_local(sv, cvec), cid)
                if best is None or key < best:
                    best = key
                    best_cvec = cvec
            if best_cvec is None:
                # empty sub-space codebook: the distributed join drops
                # this sub-space's rows but keeps the id (unreachable
                # for non-empty samples; mirrored for exactness)
                continue
            yhat.extend(best_cvec)
        if yhat:
            out[sid] = yhat
    return out


def _opq_rotate_rows(
    rows: list[tuple[int, list[float]]],
    r_e6: list[list[int]],
) -> list[tuple[int, list[float]]]:
    """Driver twin of opq_rotate's exact integer-grid kernel (the gemm
    math verbatim: quantize, int64 matmul, half-up re-quantize)."""
    import numpy as np

    if not rows:
        return rows
    r_mat = np.asarray(r_e6, dtype=np.int64)
    sids = [sid for sid, _v in rows]
    xm = np.floor(
        np.array([v for _s, v in rows], dtype=np.float64) * 1e6 + 0.5
    ).astype(np.int64)
    ym = np.floor((xm @ r_mat).astype(np.float64) / 1e6 + 0.5).astype(
        np.int64
    )
    rot = ym.astype(np.float64) / 1e6
    return [(sid, rot[i].tolist()) for i, sid in enumerate(sids)]


def opq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
    n_opq_iter: int = 1,
    ns_iter: int = 40,
    sample_bound: int = 256,
    max_sample_rows: int = 1 << 20,
) -> list[list[int]]:
    """Learn the OPQ rotation (Ge et al., CVPR 2013; FAISS OPQMatrix)
    by alternating PQ codebook training with the orthogonal Procrustes
    update: given codes, the best rotation for min ||X R - Yhat||_F is
    R = UV^T from X^T Yhat = USV^T — the POLAR factor of the scatter,
    which _ns_polar_e6 computes by Newton-Schulz so the whole fit stays
    on the exact 1e-6 integer grid (deterministic AND SQL-replayable;
    FAISS reaches the same factor via SVD).

    Alternation t: rotate the sample by R_t (t=0 skips — R_0 = I), fit
    per-sub-space codebooks (pq_fit), reconstruct, scatter
    S = X^T Yhat over the RAW sample, R_{t+1} = polar(S). The fit runs
    on the id-bounded sample (``sample_bound`` — FAISS's own
    bounded-training convention); the scatter collect is O(sample * dim)
    and REFUSED above ``max_sample_rows`` (the broadcast-guard
    discipline, similarity.py). Returns R as a row-major int64 micro
    matrix for opq_rotate."""
    # Non-finite vectors are excluded from the training sample: the local
    # fit kernels floor distances through int(math.floor(...)), which
    # raises on NaN where the distributed pq_fit this replaced yielded a
    # null distance (r11 advisor). Skipping them is the deliberate,
    # documented behavior — a NaN embedding carries no geometry to train
    # on, and FAISS likewise requires finite training vectors.
    finite = ~F.exists(
        F.col(vec_col),
        lambda v: F.isnan(v) | v.isNull() | (F.abs(v) == F.lit(float("inf"))),
    )
    sample = corpus.filter(
        (F.col(id_col) < sample_bound)
        & F.col(vec_col).isNotNull()
        & (F.size(vec_col) == dim)
        & finite
    ).select(F.col(id_col).alias("sid"), F.col(vec_col).alias("vec"))
    import numpy as np

    # ONE job total: the former separate count() guard is fused into the
    # collect via limit(max_sample_rows + 1) — if the limit row count
    # comes back over the bound the collect is refused EXACTLY as the
    # count guard refused it, and below the bound limit(n + 1) returns
    # every sample row (content-identical; _pq_fit_local's
    # distinct-by-min-id seeding is order-independent). The whole
    # alternation — rotate sample, fit per-sub-space codebooks, encode,
    # reconstruct — runs on the driver with the exact-twin kernels
    # (_pq_fit_local/_pq_encode_local/_opq_rotate_rows): the sample is
    # O(sample_bound * dim) BY CONSTRUCTION, the same driver size class
    # as the scatter this function always collected, and the Spark
    # round-trips it replaces were ~15 scheduler jobs over <=256 rows
    # (guide §1.2/§5 — don't schedule a cluster for driver-sized work).
    sample_rows = [
        (r["sid"], list(r["vec"]))
        for r in sample.limit(max_sample_rows + 1).collect()
    ]
    cnt = len(sample_rows)
    if cnt == 0:
        return _identity_e6(dim)
    if cnt > max_sample_rows:
        raise ValueError(
            f"opq_fit would collect over {max_sample_rows} sample rows to "
            "the driver (the max_sample_rows bound). Lower sample_bound "
            "(OPQ trains on a bounded sample by convention) or raise "
            "max_sample_rows explicitly."
        )
    x_rows = {sid: vec for sid, vec in sample_rows}
    r_e6 = _identity_e6(dim)
    for t in range(n_opq_iter):
        src_rows = (
            sample_rows
            if t == 0
            else _opq_rotate_rows(sample_rows, r_e6)
        )
        cb = _pq_fit_local(src_rows, m, sub_dim, k_sub, n_iter)
        y_rows = _pq_encode_local(src_rows, cb, m, sub_dim)
        sids = [sid for sid in x_rows if sid in y_rows]
        if not sids:
            return _identity_e6(dim)
        xm = np.floor(
            np.array(
                [x_rows[sid] for sid in sids], dtype=np.float64
            ) * 1e6 + 0.5
        ).astype(np.int64)
        ym = np.floor(
            np.array(
                [y_rows[sid] for sid in sids], dtype=np.float64
            ) * 1e6 + 0.5
        ).astype(np.int64)
        assert int(np.abs(xm).max(initial=0)) < (1 << 26)
        assert int(np.abs(ym).max(initial=0)) < (1 << 26)
        scatter = xm.T @ ym  # exact int64: |terms| < 2^52, n <= 2^20
        r_e6 = _ns_polar_e6(scatter, cnt, dim, ns_iter)
    return r_e6


def pq_topk_opq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
    n_opq_iter: int = 1,
    ns_iter: int = 40,
    sample_bound: int = 256,
    r_e6: list[list[int]] | None = None,
    rotate_method: str = "gemm",
) -> DataFrame:
    """ADC top-k under a LEARNED rotation — the full OPQ composition:
    opq_fit's Procrustes rotation (trained on the id-bounded sample),
    both relations rotated on the exact integer grid, then the
    certified trained-codebook search (pq_fit on the rotated corpus +
    pq_topk_trained's ADC body). ``r_e6`` accepts a precomputed
    rotation — fit once, search many. Rows with NULL or mis-sized
    vectors are dropped up front (the oracle's WHERE, and what every
    downstream kernel would reject anyway)."""
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    corpus = corpus.filter(valid)
    queries = queries.filter(valid)
    rot = (
        opq_fit(
            corpus, id_col, vec_col, dim, m, sub_dim, k_sub,
            n_iter, n_opq_iter, ns_iter, sample_bound,
        )
        if r_e6 is None
        else r_e6
    )
    rc = opq_rotate(
        corpus, vec_col, rot, dim, method=rotate_method
    ).localCheckpoint(eager=False)
    rq = opq_rotate(queries, vec_col, rot, dim, method=rotate_method)
    return pq_topk_trained(
        rc, rq, id_col, vec_col, k, m, sub_dim, k_sub, n_iter
    )


def pq_topk_ivfpq_opq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 4,
    sub_dim: int = 16,
    k_sub: int = 16,
    n_iter: int = 2,
    n_opq_iter: int = 1,
    ns_iter: int = 40,
    sample_bound: int = 256,
    r_e6: list[list[int]] | None = None,
    rotate_method: str = "gemm",
) -> DataFrame:
    """The full FAISS production stack —
    IndexPreTransform(OPQMatrix, IndexIVFPQ(by_residual=true) with
    ProductQuantizer::train): opq_fit's learned rotation applied to
    both relations on the exact integer grid, then the certified
    residual IVF-PQ trained-codebook search (pq_topk_ivf_residual_trained)
    entirely in rotated space — coarse centroids seeded from the
    ROTATED corpus, residuals taken against rotated centroids, the
    residual codebook trained on rotated residuals. Rotation cost is a
    pure per-row map; everything downstream reuses the certified plan
    shapes unchanged."""
    valid = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    corpus = corpus.filter(valid)
    queries = queries.filter(valid)
    rot = (
        opq_fit(
            corpus, id_col, vec_col, dim, m, sub_dim, k_sub,
            n_iter, n_opq_iter, ns_iter, sample_bound,
        )
        if r_e6 is None
        else r_e6
    )
    rc = opq_rotate(
        corpus, vec_col, rot, dim, method=rotate_method
    ).localCheckpoint(eager=False)
    rq = opq_rotate(queries, vec_col, rot, dim, method=rotate_method)
    return pq_topk_ivf_residual_trained(
        rc, rq, id_col, vec_col, k, n_centroids, nprobe,
        m, sub_dim, k_sub, n_iter,
    )
