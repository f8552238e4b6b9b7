"""Corpus-level training-data operators: benchmark decontamination,
Gopher-style repetition statistics, corpus unigram-LM scoring, and
deterministic shuffle-to-shards.

These extend the reference's per-partition maintenance surface (SURVEY.md
§7.6) with the corpus hygiene passes a pretraining pipeline runs between
"raw" and "training-ready": remove eval-set overlap, drop degenerate
repetitive documents, score fluency against the corpus itself, and
deterministically shard the survivors for the trainer. Everything is
built-in-function DataFrame code (no UDFs), hashes derive from md5 of
content (no RNG — reruns and the DuckDB oracles agree bit-for-bit), and
every shuffle is keyed so map-side partial aggregation applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_gardener_spark.functions.text import shingles_of, ws_tokens
from etl_gardener_spark.operators.neardup import shingle_hash_sets


def _spread_explode_input(df: DataFrame) -> DataFrame:
    """Round-robin an under-partitioned docs relation up to the session's
    core count before a char-explode kernel.

    Input-split granularity (``maxPartitionBytes``) sizes partitions for
    scan IO, but a char-level explode amplifies each input byte into
    ~1 downstream row — a few MB of compressed text expands to tens of
    millions of generated rows, all inside the scan's whole-stage-codegen
    pipeline, so a 1-file partition serializes the whole kernel on one
    core. This is NOT the r8 partition-floor case (SCALE.md: spreading
    nested-higher-order-LAMBDA shingle kernels ballooned task-seconds
    superlinearly); substring/explode trees carry no per-task lambda
    setup cost — measured at sf1 with stage-level executorRunTime:
    width 1 → wall 89.4 s / cpu 128.7 s; width 32 → wall 6.3 s /
    cpu 138.5 s (+7.6% cpu for 14x wall). Warehouse-scale day
    partitions arrive in many splits and skip the shuffle (guard below).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _h60(col) -> F.Column:
    """60-bit md5 fold (first 15 hex chars → int64) — the repo-wide content
    hash (operators/neardup.shingle_hash_sets); DuckDB mirrors it with
    list_reduce over md5 hex chars."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per training document, how many of its
    distinct word ``n``-grams also occur anywhere in the benchmark corpus.

    Output: (id, n_grams, n_overlap, overlap_frac, contaminated).

    Scale shape: the benchmark side (eval suites) is tiny relative to the
    corpus, so its distinct-gram set is BROADCAST and the corpus never
    shuffles for the join — the only shuffle is the per-document re-count,
    which map-side combines down to one row per document. Grams are
    compared as 60-bit md5 ints (8-byte join keys, not ~30-byte strings).
    """
    # explode_outer, not explode: plain explode makes Catalyst infer a
    # ``size(sh) > 0`` filter and push it below the shingle projection, so
    # the whole tokenize+shingle+md5 tree is evaluated twice per row
    # (measured 4x at sf0.1). The arrays are provably non-empty (the
    # operator filters size(tokens) >= n first), so _outer emits no nulls.
    tg = shingle_hash_sets(train, text_col, id_col, n).select(
        F.col(id_col), F.explode_outer("sh").alias("g")
    )
    bg = (
        shingle_hash_sets(bench, text_col, id_col, n)
        .select(F.explode_outer("sh").alias("g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per = tg.join(F.broadcast(bg), "g", "left").groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.count("__hit").cast("long").alias("n_overlap"),
    )
    return per.select(
        id_col,
        "n_grams",
        "n_overlap",
        F.round(F.col("n_overlap") / F.col("n_grams"), 4).alias("overlap_frac"),
        (F.col("n_overlap") > 0).alias("contaminated"),
    )


def repetition_stats(
    df: DataFrame, text_col: str, id_col: str, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """Gopher-style repetition filters: per document and per n in ``ns``,
    the token fraction covered by the single most frequent word n-gram
    (``top{n}_frac`` = max_count*n / n_tokens) and the fraction of n-gram
    positions occupied by grams that repeat (``dup{n}_frac``).

    One scan: every n's shingles are emitted from a single explode of one
    concatenated (n, gram-hash) array, then two keyed aggregations —
    (doc, n, gram) occurrence counts, then per-doc maxima/sums. Both
    shuffles carry int64 gram hashes and partial-aggregate map-side, so
    the exchanged rows collapse toward one per (doc, n, distinct-gram)
    regardless of document length — this is the scalable form of the
    O(len²) per-row expression a small corpus would tempt you into.
    """
    staged = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    )

    def _tag(n: int):
        # one-arg lambda factory: a `lambda g, n=n` default would make the
        # callable arity 2, which pyspark's transform() reads as the
        # (value, index) signature and binds n to the array index
        # (same pitfall as neardup._perm_fn)
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("g"))

    tagged = [
        F.transform(shingles_of(F.col("__toks"), n), _tag(n)) for n in ns
    ]
    # cheap-filter on the staged token attribute guarantees a non-empty
    # gram array, so explode_outer (which, unlike explode, doesn't make
    # Catalyst infer a size()>0 filter that re-evaluates the whole shingle
    # tree below the projection) emits no null rows
    grams = (
        staged.filter(F.size("__toks") >= min(ns))
        .select(
            F.col(id_col),
            F.size("__toks").cast("long").alias("nt"),
            F.explode_outer(F.concat(*tagged)).alias("ng"),
        )
        .select(
            id_col, "nt", F.col("ng.n").alias("n"), _h60(F.col("ng.g")).alias("g")
        )
    )
    per_gram = grams.groupBy(id_col, "nt", "n", "g").agg(
        F.count(F.lit(1)).alias("c")
    )
    aggs = []
    for n in ns:
        is_n = F.col("n") == n
        aggs.append(F.max(F.when(is_n, F.col("c"))).alias(f"__m{n}"))
        aggs.append(
            F.sum(F.when(is_n & (F.col("c") > 1), F.col("c"))).alias(f"__d{n}")
        )
    doc = per_gram.groupBy(id_col, "nt").agg(*aggs)
    out = [F.col(id_col)]
    for n in ns:
        out.append(
            F.round(F.col(f"__m{n}") * n / F.col("nt"), 4).alias(f"top{n}_frac")
        )
        out.append(
            # try_divide: a doc with nt == n-1 positions for a larger n
            # (e.g. 2 tokens, n=3) has zero n-gram slots -> NULL, the SQL
            # x/0 answer (differential-fuzz finding)
            F.round(
                F.try_divide(
                    F.coalesce(F.col(f"__d{n}"), F.lit(0)), F.col("nt") - n + 1
                ),
                4,
            ).alias(f"dup{n}_frac")
        )
    return doc.select(*out)


def unigram_logprob(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Corpus-unigram language-model score: estimate p(token) from the
    corpus itself (MLE, no smoothing — every token is in-vocabulary by
    construction), then score each document by mean -log2 p over its
    tokens. High bits/token = rare vocabulary (or noise); low = formulaic
    text. The cheap first-pass fluency prior of CCNet-style pipelines.

    Output: (id, n_tokens, bits_per_token).

    Two corpus passes, no corpus-keyed shuffle of full rows: pass 1 builds
    the vocabulary (token-keyed agg, map-side combined — output is
    |vocab|, bounded by the language not the corpus); the total token
    count joins on via a broadcast singleton (no driver collect); pass 2
    re-scores tokens with the vocabulary BROADCAST and map-side combines
    straight to one row per document.
    """
    toks = (
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") > 0)
        .select(F.col(id_col), F.explode_outer("__toks").alias("t"))
    )
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("tot"))
    # Per-token log-probs are quantized to integer micro-units BEFORE the
    # per-document sum (see functions/exact.py): a double AVG's fold
    # order varies with shuffle-fetch order run-to-run (and differs from
    # any oracle engine), while the decimal micro-sum is exact and
    # order-free; the half-up 4-dp display uses the portable floor
    # kernel. The ~5e-7-bit quantization is far below the score's
    # discriminative resolution.
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "t",
        F.floor(F.log2(F.col("c") / F.col("tot")) * 1e6 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("lpm"),
    )
    return (
        toks.join(F.broadcast(scored), "t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lpm").alias("__s"),
        )
        .select(
            id_col,
            "n_tokens",
            (
                F.expr(
                    "floor((-(cast(__s as double) / 1e6"
                    " / cast(n_tokens as double))) * 1e4 + 0.5)"
                )
                / 1e4
            ).alias("bits_per_token"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    seed: str = "shuffle-42",
) -> DataFrame:
    """Deterministic corpus shuffle for training export: each row gets a
    pseudo-random but md5-reproducible (shard, pos_in_shard) address.

    Output: (id, shard, pos_in_shard).

    A global ORDER BY would funnel the corpus through one range
    partitioner; instead the md5 key is split — low bits pick the shard
    (n_shards-way parallel), and position is a ROW_NUMBER window *within*
    each shard ordered by the same key, so every shard sorts
    independently. Readers that concatenate shards in (shard, pos) order
    see a stable global permutation; reruns reproduce it bit-for-bit
    (seed is part of the hashed content, not an RNG state).
    """
    key = _h60(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return (
        df.select(F.col(id_col), key.alias("key"))
        .withColumn("shard", F.pmod(F.col("key"), F.lit(n_shards)).cast("long"))
        .select(
            id_col,
            "shard",
            F.row_number().over(w).cast("long").alias("pos_in_shard"),
        )
    )


def chunk_sequences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_len: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding-window chunking for training sequences — the dual of
    operators/packing.pack_sequences (that combines short docs; this
    splits long ones): every document becomes ceil-ish(len/stride) chunks
    of up to ``chunk_len`` tokens, starting every ``stride`` tokens
    (stride < chunk_len gives overlapping context windows).

    Output: (id, chunk_id, n_tokens, chunk_text).

    Pure per-row expression work — tokenize once, one explode_outer of the
    per-doc chunk array (no inferred-filter re-evaluation; see
    repetition_stats), zero shuffles: chunking a 100 TB corpus is a map.
    """
    staged = df.select(
        F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks")
    ).filter(F.size("__toks") > 0)
    starts = F.sequence(
        F.lit(0), F.floor((F.size("__toks") - 1) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.cast("long").alias("chunk_id"),
            F.slice(F.col("__toks"), s * stride + 1, chunk_len).alias("ctoks"),
        ),
    )
    return staged.select(
        F.col(id_col), F.explode_outer(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.size("c.ctoks").cast("long").alias("n_tokens"),
        F.array_join("c.ctoks", " ").alias("chunk_text"),
    )


def mixture_report(
    df: DataFrame,
    strat_cols: list[str],
    text_col: str,
) -> DataFrame:
    """Dataset-card mixture table: per stratum (e.g. source x lang), the
    document count, token count, and share of all corpus tokens — the
    numbers a data-mixture spec is written against.

    One scan: per-row token counts feed a strat-keyed agg (map-side
    combined to |strata| rows); the corpus total joins on via a broadcast
    singleton, never a driver collect.
    """
    per = (
        df.select(
            *[F.col(c) for c in strat_cols],
            F.size(ws_tokens(F.col(text_col))).cast("long").alias("__cnt"),
        )
        .groupBy(*strat_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__cnt").cast("long").alias("n_tokens"),
        )
    )
    total = per.agg(F.sum("n_tokens").alias("__tot"))
    return per.crossJoin(F.broadcast(total)).select(
        *strat_cols,
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / F.col("__tot"), 6).alias("token_share"),
    )


def drop_duplicate_lines(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    line_sep: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-wide duplicate-LINE removal (the C4 / MassiveText line
    filter): a line whose normalized form appears in more than
    ``max_docs`` distinct documents is boilerplate (nav bars, cookie
    banners, license headers) and is dropped from EVERY document; each
    survivor document is reassembled in original line order. Blank lines
    (paragraph separators) are never dedup-eligible — they are structure,
    present in every real document.

    Output: (id, text, n_lines_kept, n_lines_dropped) with ``text``
    rebuilt from the kept lines.

    Spark shape — two shuffles, both on the 60-bit line hash:
      1. posexplode lines, hash the normalized line, groupBy(hash) with
         a countDistinct(doc) — map-side combine collapses each
         partition's repeats before the wire.
      2. join the (hash, n_docs) verdicts back to the line stream
         (hash-keyed equi-join; AQE may broadcast the verdict side when
         few lines repeat), then one groupBy(doc) rebuilds documents via
         array_sort(collect_list(struct(pos, line))) — order restored by
         the explicit pos key, never by partition luck.

    At 100 TB the verdict table is |distinct lines| rows of 16 bytes —
    orders of magnitude smaller than the corpus — and no stage holds a
    whole document set in memory; cost is two hash-partitioned passes
    over the line stream. (Suffix-array substring dedup is the heavier
    cousin; line-grain is the standard first pass.)
    """
    # two consumers (verdict aggregate + join-back): pin the hashed line
    # stream once so split+md5 runs one corpus scan, not two (guide §2.4).
    # SIZE CLASS (r11 advisor): this pins an O(corpus-lines) relation —
    # (id, pos, hash, line) — to executor storage, a measured 2x win at
    # bench scale but storage pressure at the 100 TB design point; there
    # the checkpoint should be dropped (recompute: one extra scan) or
    # replaced by a spill-to-disk persist, gated on estimated input size.
    lines = _line_stream(df, text_col, id_col, line_sep).localCheckpoint(
        eager=True
    )
    verdict = lines.groupBy("__h").agg(
        F.countDistinct("__id").alias("__n_docs")
    )
    # Blank lines (paragraph separators) are structure, not content: they
    # appear in every real document and must never be dedup-eligible.
    tagged = lines.join(verdict, "__h").withColumn(
        "__keep",
        (F.col("__n_docs") <= max_docs) | (F.trim(F.col("__line")) == ""),
    )
    return _rebuild_lines(tagged, id_col, text_col, line_sep)


def _line_stream(
    df: DataFrame, text_col: str, id_col: str, line_sep: str
) -> DataFrame:
    """(__id, __pos, __line, __h) line stream shared by the full and
    incremental line-dedup passes. NULL text coalesces to '' so a
    NULL-text doc round-trips as one blank (never dedup-eligible) line
    exactly like an empty-string doc — split(NULL) would yield zero
    posexplode rows and silently DROP the document from the output."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), line_sep)
        ).alias("__pos", "__line"),
    ).withColumn("__h", _h60(F.lower(F.trim(F.col("__line")))))


def _rebuild_lines(
    tagged: DataFrame, id_col: str, text_col: str, line_sep: str
) -> DataFrame:
    """Reassemble documents from a __keep-tagged line stream: order is
    restored by the explicit __pos key, never by partition luck."""
    return (
        tagged.groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("__keep"), F.struct("__pos", "__line")
                    )
                )
            ).alias("__kept"),
            F.sum(F.when(F.col("__keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_lines_kept"),
            F.sum(F.when(F.col("__keep"), 0).otherwise(1))
            .cast("long")
            .alias("n_lines_dropped"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["__line"]),
                line_sep,
            ).alias(text_col),
            "n_lines_kept",
            "n_lines_dropped",
        )
    )


def line_hash_store(
    df: DataFrame, text_col: str, id_col: str, *, line_sep: str = "\n"
) -> DataFrame:
    """Persistable line-hash store for incremental line dedup: one row
    per distinct normalized-line hash in the corpus with its distinct-
    document count — ``(line_hash, n_docs)``. 16 bytes per distinct
    line: the compact state a daily ingest keeps instead of rescanning
    history (same batch-vs-store discipline as the MinHash signature
    store and the SemDeDup centroid store). Doc-id-BLIND by design —
    see the disjoint-id precondition on
    :func:`drop_duplicate_lines_incremental`."""
    return (
        _line_stream(df, text_col, id_col, line_sep)
        .groupBy(F.col("__h").alias("line_hash"))
        .agg(F.countDistinct("__id").cast("long").alias("n_docs"))
    )


def drop_duplicate_lines_incremental(
    batch: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
    *,
    line_sep: str = "\n",
    max_docs: int = 1,
) -> DataFrame:
    """Incremental duplicate-line removal: dedup an incoming BATCH
    against a persisted :func:`line_hash_store` without rescanning the
    historical corpus. A batch line is dropped when its TOTAL distinct-
    doc count — store count plus batch count — exceeds ``max_docs``;
    blank lines stay ineligible. Equivalent, for the batch documents, to
    running :func:`drop_duplicate_lines` over (history ∪ batch) — the
    equivalence is property-tested and is what makes daily ingest dedup
    exact, not approximate.

    PRECONDITION — batch doc ids must be DISJOINT from the store's
    corpus. The store is doc-id-blind (16 bytes per line, no membership
    set), so a re-ingested document's prior version counts as a distinct
    historical document: a line unique to that one document carries
    store count 1 plus batch count 1 = 2 and is dropped at the default
    ``max_docs=1``. That is the intended semantics for re-ingestion
    ("my own history is still history") but it is NOT the union-dedup
    answer; exact union equivalence holds only for disjoint ids. Both
    behaviors are pinned by tests/test_linededup_properties.py. Callers
    that truly need update-in-place exactness must rebuild the store
    without the superseded doc (or keep per-doc membership, trading away
    the compact-store design).

    Scale shape: the history never rescans — its compact store joins the
    batch's line stream hash-to-hash (AQE broadcasts the smaller side),
    and the only other shuffle is the batch-internal verdict aggregate.
    Store maintenance composes the same way: the next store is the old
    one outer-merged with ``line_hash_store(batch)``, counts summed.
    """
    lines = _line_stream(batch, text_col, id_col, line_sep)
    batch_verdict = lines.groupBy("__h").agg(
        F.countDistinct("__id").alias("__bn")
    )
    st = store.select(
        F.col("line_hash").alias("__h"), F.col("n_docs").alias("__sn")
    )
    verdict = batch_verdict.join(st, "__h", "left").select(
        "__h",
        (F.col("__bn") + F.coalesce(F.col("__sn"), F.lit(0))).alias(
            "__n_docs"
        ),
    )
    tagged = lines.join(verdict, "__h").withColumn(
        "__keep",
        (F.col("__n_docs") <= max_docs) | (F.trim(F.col("__line")) == ""),
    )
    return _rebuild_lines(tagged, id_col, text_col, line_sep)


def drop_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_len: int = 8,
    max_docs: int = 1,
) -> DataFrame:
    """Substring-grain duplicate-SPAN removal — the heavier cousin of
    :func:`drop_duplicate_lines` (suffix-array exact-substring dedup a la
    "Deduplicating Training Data Makes Language Models Better",
    approximated at fixed token grain): any ``span_len``-token window
    whose content appears in more than ``max_docs`` distinct documents is
    boilerplate, and every token COVERED by such a window is dropped from
    every document — catching templated passages that cross line
    boundaries, which line-grain dedup misses entirely.

    Output: (id, text, n_tokens_kept, n_tokens_dropped) with ``text``
    rebuilt from surviving tokens in original order (whitespace- and
    case-normalized, the token discipline). Documents shorter than
    ``span_len`` tokens have no windows and always survive whole.

    Spark shape — the line-dedup plan generalized to sliding windows,
    all shuffles keyed on the 60-bit window hash or the doc id:
      1. one projection stages the token array (attribute, not inline —
         the shingles_of CollapseProject hazard), then posexplode emits
         one (doc, start, window-hash) row per window;
      2. groupBy(window-hash) countDistinct(doc) builds the verdict
         relation — |distinct windows| rows, map-side combined;
      3. duplicate windows join back (AQE broadcasts the verdict side
         when few windows repeat) and explode into their span_len
         covered positions — an L-times blowup of DUPLICATE windows
         only, not of the corpus;
      4. tokens left-anti join covered (doc, pos) pairs and one
         groupBy(doc) rebuilds documents via the explicit pos key.

    At 100 TB: the verdict table is |distinct windows| * 16 bytes and
    the covered-position stream is L * |duplicate windows| — both
    corpus-fraction-sized for natural text; no stage holds a document
    set in memory. A true suffix-array pass also catches VARIABLE-length
    repeats; fixed-grain windows are the standard distributed
    approximation — with a PINNED bound
    (tests/test_spandedup_properties.py, r8 verdict item 5): at token
    grain the window pass removes EXACTLY the tokens lying in a
    cross-doc duplicated substring of length >= span_len (a repeat of
    length R >= L is tiled by its R-L+1 duplicated L-windows, so
    coverage is equality, not approximation), and its only miss classes
    vs full suffix-array semantics are (a) repeats shorter than
    span_len and (b) repeats whose extra occurrences are all WITHIN one
    document (the distinct-docs verdict rule never fires). It never
    removes a token the full semantics wouldn't.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        ws_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    )
    # one row per sliding window start; slice() is 1-indexed
    grams = toks.select(
        "__id",
        F.col("__toks"),
        F.explode(
            F.when(
                F.size("__toks") >= span_len,
                F.sequence(F.lit(0), F.size("__toks") - span_len),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__p"),
    ).select(
        "__id",
        "__p",
        _h60(
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__p") + 1, span_len)
            )
        ).alias("__h"),
        # two consumers (the verdict aggregate and the join-back): pin
        # the narrow (id, p, h) gram stream once so the slice+concat+md5
        # window kernel — the CPU floor of the pass — runs ONE corpus
        # scan, not two (guide §2.4; the shingle hashes= contract).
        # SIZE CLASS (r11 advisor): O(corpus-tokens) rows pinned to
        # executor storage — at the 100 TB design point gate this on
        # estimated input size and fall back to recompute (one extra scan)
    ).localCheckpoint(eager=True)
    dup = (
        grams.groupBy("__h")
        .agg(F.countDistinct("__id").alias("__n_docs"))
        .filter(F.col("__n_docs") > max_docs)
    )
    covered = (
        grams.join(dup, "__h")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + span_len - 1)
            ).alias("__pos"),
        )
        .distinct()
    )
    # LEFT join + keep flag (not an anti-join): a fully-covered document
    # must still emit an output row with empty text, and posexplode_outer
    # keeps zero-token documents represented too.
    tokens = toks.select(
        "__id", F.posexplode_outer("__toks").alias("__pos", "__tok")
    )
    tagged = tokens.join(
        covered.withColumn("__cov", F.lit(1)), ["__id", "__pos"], "left"
    ).withColumn(
        "__keep", F.col("__cov").isNull() & F.col("__tok").isNotNull()
    )
    return (
        tagged.groupBy("__id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("__keep"), F.struct("__pos", "__tok"))
                )
            ).alias("__kept"),
            F.sum(
                F.when(
                    ~F.col("__keep") & F.col("__tok").isNotNull(), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_tokens_dropped"),
        )
        .select(
            F.col("__id").alias(id_col),
            F.array_join(
                F.transform(F.col("__kept"), lambda s: s["__tok"]), " "
            ).alias(text_col),
            F.size("__kept").cast("long").alias("n_tokens_kept"),
            "n_tokens_dropped",
        )
    )


def duplicate_span_profile(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    span_len: int = 8,
    max_docs: int = 1,
) -> DataFrame:
    """Measurement companion to :func:`drop_duplicate_spans` — per
    document, how many tokens WOULD be removed by span dedup: the number
    an operator reads (aggregated over the corpus) before committing to
    the rewrite, and the per-doc screen for template-dominated documents
    (coverage_frac near 1 = the doc is mostly boilerplate even when no
    single line repeats).

    Output: (id, n_tokens, n_covered, coverage_frac).

    Same two window-hash-keyed shuffles as the rewrite, but it stops at
    the covered-position COUNT — no token stream is rebuilt, so the
    profile is strictly cheaper than the rewrite it predicts.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        ws_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    )
    grams = toks.select(
        "__id",
        F.col("__toks"),
        F.explode(
            F.when(
                F.size("__toks") >= span_len,
                F.sequence(F.lit(0), F.size("__toks") - span_len),
            ).otherwise(F.array().cast("array<int>"))
        ).alias("__p"),
    ).select(
        "__id",
        "__p",
        _h60(
            F.concat_ws(
                " ", F.slice(F.col("__toks"), F.col("__p") + 1, span_len)
            )
        ).alias("__h"),
        # two consumers (the verdict aggregate and the join-back): pin
        # the narrow (id, p, h) gram stream once so the slice+concat+md5
        # window kernel — the CPU floor of the pass — runs ONE corpus
        # scan, not two (guide §2.4; the shingle hashes= contract).
        # SIZE CLASS (r11 advisor): O(corpus-tokens) rows pinned to
        # executor storage — at the 100 TB design point gate this on
        # estimated input size and fall back to recompute (one extra scan)
    ).localCheckpoint(eager=True)
    dup = (
        grams.groupBy("__h")
        .agg(F.countDistinct("__id").alias("__n_docs"))
        .filter(F.col("__n_docs") > max_docs)
    )
    covered_counts = (
        grams.join(dup, "__h")
        .select(
            "__id",
            F.explode(
                F.sequence(F.col("__p"), F.col("__p") + span_len - 1)
            ).alias("__pos"),
        )
        .distinct()
        .groupBy("__id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_covered"))
    )
    base = toks.select(
        "__id", F.size("__toks").cast("long").alias("n_tokens")
    )
    return base.join(covered_counts, "__id", "left").select(
        F.col("__id").alias(id_col),
        "n_tokens",
        F.coalesce(F.col("n_covered"), F.lit(0))
        .cast("long")
        .alias("n_covered"),
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.coalesce(F.col("n_covered"), F.lit(0))
                / F.col("n_tokens"),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("coverage_frac"),
    )


def _bloom_pos(g: F.Column, i: int, bits: int) -> F.Column:
    """Bloom bit position for hash function ``i`` over a 60-bit gram
    hash: the repo's portable md5 bucket kernel (first 8 hex chars as
    int64, mod bits) — DuckDB mirrors it as
    ``('0x' || substr(md5('bloom{i}:' || g), 1, 8))::BIGINT % bits``."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}:"), g.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % bits
    )


def bloom_gram_store(
    bench: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    bits: int = 1 << 17,
    hashes: int = 3,
    gram_hashes: DataFrame | None = None,
) -> DataFrame:
    """Bloom-filter store of a benchmark corpus's word ``n``-grams: one
    row per SET bit — ``(bit_pos)``, at most ``bits`` rows of one int64.

    The sparse-set representation (positions-as-table instead of a
    packed bitmap) is what makes the filter a first-class warehouse
    object: persistable as parquet, mergeable by plain UNION/DISTINCT
    (bitwise-OR of bitmaps ≡ set union of positions), and — because the
    k hash functions are md5-derived with no RNG — bit-for-bit
    reproducible and oracle-checkable in SQL. At full fill the store is
    ``bits`` rows (1 MiB at the 2^17 default), broadcast-sized however
    large the benchmark side grows; size ``bits`` ≥ ~10x the expected
    distinct-gram count to keep the false-positive rate near
    (fill)^hashes.

    ``gram_hashes``: optional precomputed ``shingle_hash_sets(bench, …)``
    relation — callers that also run the exact verification join over
    the same benchmark side (``doc_bloom_decontaminate``) pass the one
    materialized hash relation so the md5 shingling pass runs once, not
    once per consumer (guide §2.4: don't recompute what a sibling branch
    already computed).
    """
    sh = (
        gram_hashes
        if gram_hashes is not None
        else shingle_hash_sets(bench, text_col, id_col, n)
    )
    bg = (
        sh.select(F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    pos = F.array(*[_bloom_pos(F.col("g"), i, bits) for i in range(hashes)])
    return bg.select(F.explode(pos).alias("bit_pos")).distinct()


def bloom_decontaminate(
    train: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    bits: int = 1 << 17,
    hashes: int = 3,
    gram_hashes: DataFrame | None = None,
) -> DataFrame:
    """Bloom pre-filter for benchmark decontamination: per training
    document, how many of its distinct word ``n``-grams the Bloom
    ``store`` (from :func:`bloom_gram_store`, SAME n/bits/hashes) flags
    as maybe-in-benchmark — a gram is flagged iff ALL ``hashes`` of its
    bit positions are set. Output: ``(id, n_grams, n_maybe_hits)``.

    This is the 100 TB shape of :func:`decontaminate`'s first pass: the
    corpus-side join probes a broadcast ≤``bits``-row store instead of
    the benchmark's full distinct-gram set (which for a large eval
    suite union can be GBs), and only the maybe-flagged minority ever
    needs the exact verification join. No false negatives — a gram in
    the benchmark always has all its bits set — so the pre-filter never
    loses a contamination; false positives (measured against the exact
    join by the registry query ``doc_bloom_decontaminate``) cost only
    wasted verification work, at rate ≈ fill^hashes.

    ``gram_hashes``: optional precomputed ``shingle_hash_sets(train, …)``
    relation, same sharing contract as :func:`bloom_gram_store`.
    """
    sh = (
        gram_hashes
        if gram_hashes is not None
        else shingle_hash_sets(train, text_col, id_col, n)
    )
    tg = (
        sh.select(F.col(id_col), F.explode_outer("sh").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    probe = tg.select(
        F.col(id_col),
        F.col("g"),
        F.explode(
            F.array(*[_bloom_pos(F.col("g"), i, bits) for i in range(hashes)])
        ).alias("bit_pos"),
    )
    hits = (
        probe.join(
            F.broadcast(store.withColumn("__set", F.lit(1))), "bit_pos", "left"
        )
        .groupBy(id_col, "g")
        .agg(F.count("__set").alias("__nset"))
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(F.when(F.col("__nset") == hashes, 1).otherwise(0))
        .cast("long")
        .alias("n_maybe_hits"),
    )


def repetition_signals(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Intra-document repetition quality signals (Rae et al. 2021,
    "Scaling Language Models" — the Gopher repetition filters): per
    document with >= 3 tokens,

      (id, n_tokens, top_bigram, top_bigram_count,
       top_bigram_char_frac, dup_trigram_frac)

    where top_bigram is the most frequent word 2-gram (count DESC, then
    lexicographic — total order, hash-stable), top_bigram_char_frac is
    a COUNT-WEIGHTED character ratio (count x len(bigram) / total token
    chars — all integer until the final floor-kernel display at 4 dp),
    and dup_trigram_frac is the fraction of 3-gram OCCURRENCES whose
    3-gram repeats within the document.

    NOTE on top_bigram_char_frac vs the paper: Gopher's metric is the
    fraction of characters *covered* by top-2-gram occurrences (union
    of spans, <= 1.0). This count-weighted variant double-counts
    characters of overlapping occurrences and includes the bigram's
    internal space in the numerator while the denominator excludes all
    whitespace, so it CAN EXCEED 1.0 on degenerate inputs
    ("a a a a ..." pins 1.6875 in tests). It orders documents the same
    way on natural text, but the paper's 0.20 drop threshold is NOT
    directly transferable — calibrate thresholds against this metric,
    or post-process with least(frac, 1.0) if a bounded score is needed.
    The count-weighted form is what keeps the kernel a pure integer
    aggregate (no span-overlap resolution, which would need a per-doc
    positional scan). Thresholding stays with the caller either way
    (Gopher drops at top-2-gram fraction > 0.20, dup-3-gram > 0.18).

    Plan shape: one shingle explode per n, per-(doc, gram) hash
    aggregates (map-side combined), a per-doc WindowGroupLimit top-1 for
    the bigram, and one per-doc aggregate for the trigram fractions —
    everything keyed on the document, so the whole computation
    partitions by doc_id and scales linearly in corpus tokens with no
    cross-document shuffle."""
    from etl_gardener_spark.functions.exact import floor_div_expr
    from etl_gardener_spark.functions.text import shingles_of, ws_tokens

    t = (
        df.select(F.col(id_col), ws_tokens(F.col(text_col)).alias("__toks"))
        .filter(F.size("__toks") >= 3)
        .select(
            id_col,
            "__toks",
            F.size("__toks").cast("long").alias("n_tokens"),
            F.aggregate(
                F.transform("__toks", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).alias("doc_chars"),
        )
    )
    bc = (
        t.select(
            id_col, F.explode(shingles_of(F.col("__toks"), 2)).alias("bg")
        )
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c").desc(), F.col("bg").asc()
    )
    top = (
        bc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("bg").alias("top_bigram"),
            F.col("c").alias("top_bigram_count"),
        )
    )
    ta = (
        t.select(
            id_col, F.explode(shingles_of(F.col("__toks"), 3)).alias("tg")
        )
        .groupBy(id_col, "tg")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("__dup"),
            F.sum("c").cast("long").alias("__tot"),
        )
    )
    return (
        t.select(id_col, "n_tokens", "doc_chars")
        .join(top, id_col)
        .join(ta, id_col)
        .select(
            id_col,
            "n_tokens",
            "top_bigram",
            "top_bigram_count",
            (
                F.expr(
                    floor_div_expr(
                        "2 * top_bigram_count * length(top_bigram) * 10000"
                        " + doc_chars",
                        "2 * doc_chars",
                    )
                ).cast("double")
                / 10000.0
            ).alias("top_bigram_char_frac"),
            (
                F.expr(
                    floor_div_expr("2 * __dup * 10000 + __tot", "2 * __tot")
                ).cast("double")
                / 10000.0
            ).alias("dup_trigram_frac"),
        )
    )


def ngram_novelty(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document n-gram NOVELTY against everything ingested before it
    (smaller id = earlier): the fraction of a document's distinct hashed
    n-gram shingles whose FIRST occurrence (min doc id) is this
    document.

    The curriculum/dedup-triage signal between exact dedup and pair
    generation: novelty ~1 means fresh content, ~0 means the document is
    assembled from already-seen text (template spam, quote farms) even
    when no single pair clears a near-dup threshold. Deduplicating
    training data this way (keep first, score the rest by what they
    add) is the streaming view of MinHash dedup's min-id survivor rule.

    Output: (id, n_shingles, n_novel, novelty) over documents with >= n
    tokens; novelty displays through the sign-correct floor kernel at
    4 dp (integers until the final divide).

    Plan shape: one shingle explode, one groupBy(h) min aggregate (the
    first-occurrence index — map-side combined), one equi-join back on
    the shingle hash, one per-doc aggregate. Everything keys on the
    shingle hash or the doc id: no pair join, no corpus² term, and the
    first-occurrence index is exactly the relation an incremental
    ingest persists (same store shape as line_hash_store) so tomorrow's
    batch scores against it at batch cost.
    """
    from etl_gardener_spark.functions.exact import floor_div_expr

    # one exchange shared by BOTH consumers: the exploded relation is
    # hash-repartitioned on the shingle key, which (a) materializes the
    # md5 pass once as shuffle output feeding the first-occurrence
    # aggregate AND the probe side with no further shuffle (both key on
    # __h), and (b) costs none of localCheckpoint's driver-side
    # partition iteration — the r7 lazy-checkpoint version measured
    # 10.4 s wall ≈ 10.0 task-s (single-core materialization); this
    # plan is 1.3 s wall at sf0.1. explode_outer + isNotNull, not bare
    # explode: InferFiltersFromGenerate + the join's key-null filter
    # otherwise inline the whole tokenize+md5 tree into a pushed-down
    # per-row Filter below the exchange (the corpus.py:49 idiom).
    ex = (
        shingle_hash_sets(df, text_col, id_col, n)
        .select(F.col(id_col), F.explode_outer("sh").alias("__h"))
        .filter(F.col("__h").isNotNull())
        .repartition(F.col("__h"))
    )
    firsts = ex.groupBy("__h").agg(F.min(id_col).alias("__first"))
    return (
        ex.join(firsts, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_novel",
            (
                F.expr(
                    floor_div_expr(
                        "2 * n_novel * 10000 + n_shingles", "2 * n_shingles"
                    )
                ).cast("double")
                / 10000.0
            ).alias("novelty"),
        )
    )


def char_trigram_nll(
    store_docs: DataFrame,
    batch_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: float = 0.5,
) -> DataFrame:
    """Character-trigram language-model quality score — the CCNet-style
    perplexity gate: train add-k-smoothed trigram counts on the
    persisted reference corpus (``store_docs``), score each incoming
    ``batch_docs`` document by its mean negative log-likelihood per
    trigram. Low avg_nll = looks like the reference corpus; high =
    boilerplate/garbled/off-domain — the third quality axis next to the
    heuristic score (length/diversity/punct) and DSIR's hashed-ngram
    importance weights.

    Output: (id, n_trigrams, avg_nll) for batch docs with >= 3 chars
    (shorter docs emit no row — the shingle discipline).

    p(ch | ctx) = (c(ctx,ch) + k) / (n(ctx) + k·V), V = distinct chars
    in the train corpus; unseen context => uniform 1/V. Per-trigram
    -ln(p) is floored to integer micro-units BEFORE the per-doc sum
    (the DSIR kernel): integer sums are order-independent, so the
    distributed aggregate is bit-reproducible and oracle-exact —
    summing raw doubles would hash-diverge on shuffle order.

    Scale shape: the model is |observed (ctx,ch)| rows — bounded by
    alphabet³, broadcastable; scoring is one batch scan + two equi-joins
    on (ctx[, ch]) + one map-side-combinable integer aggregate. Training
    is one store scan, amortized across ingests like every signature
    store in the incremental family.
    """
    store_docs = _spread_explode_input(store_docs)
    batch_docs = _spread_explode_input(batch_docs)

    def tri(df: DataFrame) -> DataFrame:
        s = df.select(
            F.col(id_col), F.lower(F.col(text_col)).alias("__s")
        ).filter(F.length("__s") >= 3)
        return s.select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.length("__s") - 2)).alias("__i"),
            "__s",
        ).select(
            id_col,
            F.expr("substring(__s, __i, 2)").alias("ctx"),
            F.expr("substring(__s, __i + 2, 1)").alias("ch"),
        )

    train = tri(store_docs)
    cnt = train.groupBy("ctx", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    # per-doc array_distinct BEFORE the explode: the global distinct
    # count is identical, but the exploded stream shrinks from |chars|
    # to |distinct chars per doc| (~10x for natural text — measured
    # ~40% of this operator's cpu was the raw char explode). The
    # length >= 1 filter guards the phantom-vocab class found by fuzz
    # seed 48: split('', '') is [''] (one empty-string element, NOT an
    # empty array), which would count '' as a vocabulary entry exactly
    # like the sequence(1,0)-descends bug this replaced.
    vocab = (
        store_docs.select(F.lower(F.col(text_col)).alias("__s"))
        .filter(F.length("__s") >= 1)
        .select(
            F.explode(F.array_distinct(F.split("__s", ""))).alias("__ch")
        )
        .agg(F.count_distinct("__ch").cast("double").alias("v"))
    )
    # the model relations are bounded by |alphabet|^3 observed trigram
    # contexts (the docstring's broadcastable claim) and are COLLECTED
    # once (guide §1.2, the r11 O(model)-collect pattern): before,
    # ``cnt`` fed two separate broadcast builds — the (ctx, ch) join AND
    # the ctx_tot derivation — so the train-side trigram explode +
    # aggregate ran TWICE, and the vocab count was a third concurrent
    # store pass; 3x33 concurrent tasks oversubscribed the cores
    # (measured 46.9 task-s vs 16.7 cpu-s at sf0.1). Now one pass
    # collects the model, ctx totals are an exact integer re-sum of the
    # collected counts on the driver (the same values the former Spark
    # SUM produced), and the vocab scalar rides as a literal. The two
    # remaining train jobs (model + vocab) overlap on idle cores.
    # Caveat unchanged from the broadcast-hint era: on a CJK-heavy
    # corpus the observed-trigram model can reach ~1e7 rows — the same
    # memory class the broadcast build always pinned on the driver; a
    # deployment hitting that should sample the reference corpus.
    from etl_gardener_spark.functions.localrel import local_df
    from etl_gardener_spark.parallel import run_jobs

    spark = batch_docs.sparkSession
    cnt_rows, v = run_jobs(
        [
            lambda: cnt.collect(),
            lambda: float(vocab.collect()[0]["v"]),
        ]
    )
    ctx_totals: dict[str, int] = {}
    for r in cnt_rows:
        ctx_totals[r["ctx"]] = ctx_totals.get(r["ctx"], 0) + r["c"]
    cnt_local = local_df(
        spark,
        [(r["ctx"], r["ch"], r["c"]) for r in cnt_rows],
        "ctx string, ch string, c long",
    )
    ctx_local = local_df(
        spark, sorted(ctx_totals.items()), "ctx string, n long"
    )
    scored = (
        tri(batch_docs)
        .join(F.broadcast(cnt_local), ["ctx", "ch"], "left")
        .join(F.broadcast(ctx_local), "ctx", "left")
        .select(
            id_col,
            F.floor(
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k))
                    / (F.coalesce(F.col("n"), F.lit(0)) + F.lit(k) * F.lit(v))
                )
                * 1e6
                + 0.5
            )
            .cast("long")
            .alias("__nll_e6"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_trigrams"),
        (
            F.floor(
                F.sum("__nll_e6").cast("double")
                / F.count(F.lit(1))
                / 1e6
                * 10000
                + 0.5
            )
            / 10000
        ).alias("avg_nll"),
    )
