"""Unit tests for corpus-hygiene operators (operators/corpus.py) on
crafted inputs with hand-computed answers, plus plan-shape assertions
(the broadcast sides must actually broadcast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.operators import corpus as CP
from etl_gardener_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b"),  # pure repetition
        (2, "one two three four five six seven"),  # no repeats
        (3, "x y z x y z q r s t"),  # partial repetition
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_stats_hand_computed(docs):
    got = {
        r.doc_id: r.asDict()
        for r in CP.repetition_stats(docs, "text", "doc_id").collect()
    }
    # doc 1: nt=6; 2-grams = [ab, ba, ab, ba, ab] -> max c=3 ("a b"),
    # every position's gram repeats -> dup2 = 5/5
    assert got[1]["top2_frac"] == 1.0  # 3*2/6
    assert got[1]["dup2_frac"] == 1.0
    # 3-grams = [aba, bab, aba, bab] -> max 2, top3 = 2*3/6, dup3 = 4/4
    assert got[1]["top3_frac"] == 1.0
    assert got[1]["dup3_frac"] == 1.0
    # doc 2: nt=7, all grams unique -> top2 = 2/7, dup = 0
    assert got[2]["top2_frac"] == round(2 / 7, 4)
    assert got[2]["dup2_frac"] == 0.0
    assert got[2]["top3_frac"] == round(3 / 7, 4)
    assert got[2]["dup3_frac"] == 0.0
    # doc 3: nt=10; "x y"/"y z" occur twice -> max 2, dup2 = 4/9
    assert got[3]["top2_frac"] == round(4 / 10, 4)
    assert got[3]["dup2_frac"] == round(4 / 9, 4)


def test_decontaminate_counts_and_broadcast(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench gram
            (2, "one two three four five six"),  # clean
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    out = CP.decontaminate(train, bench, "text", "doc_id", n=5)
    got = {r.doc_id: r.asDict() for r in out.collect()}
    # train doc 1 has 2 distinct 5-grams; 1 of them (alpha..epsilon) is
    # the bench doc's only 5-gram
    assert got[1] == {
        "doc_id": 1,
        "n_grams": 2,
        "n_overlap": 1,
        "overlap_frac": 0.5,
        "contaminated": True,
    }
    assert got[2]["n_overlap"] == 0 and got[2]["contaminated"] is False
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # bench grams broadcast, corpus unshuffled


def test_unigram_logprob_hand_computed(spark):
    # corpus: 4 tokens total, p(a)=2/4, p(b)=1/4, p(c)=1/4
    df = spark.createDataFrame([(1, "a a b"), (2, "c")], ["doc_id", "text"])
    got = {r.doc_id: r.asDict() for r in CP.unigram_logprob(df, "text", "doc_id").collect()}
    # doc 1: -(log2(.5)+log2(.5)+log2(.25))/3 = (1+1+2)/3
    assert got[1]["n_tokens"] == 3
    assert got[1]["bits_per_token"] == round(4 / 3, 4)
    assert got[2] == {"doc_id": 2, "n_tokens": 1, "bits_per_token": 2.0}


def test_shuffle_shards_is_a_permutation_and_deterministic(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = CP.shuffle_shards(df, "doc_id", n_shards=8).collect()
    assert len(out) == 1000
    assert len({r.doc_id for r in out}) == 1000
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = CP.shuffle_shards(df, "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed produces a different permutation
    moved = CP.shuffle_shards(df, "doc_id", n_shards=8, seed="other").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, moved))


def test_semantic_dedup_keeps_min_id_per_duplicate_set(spark):
    # two tight groups along different axes; ids 0,1 seed the clusters.
    # 8-dim vectors; group A = ids {0,2,4} identical, group B = {1,3}
    # identical, id 5 unique (near group B but below threshold).
    a = [1.0] + [0.0] * 7
    b = [0.0] * 7 + [1.0]
    mix = [0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.86]
    rows = [(0, a), (2, a), (4, a), (1, b), (3, b), (5, mix)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r.vec_id: r.keep
        for r in SIM.semantic_dedup(
            df, "vec_id", "embedding", k=2, n_iter=1, threshold=0.99
        ).collect()
    }
    assert out == {0: True, 2: False, 4: False, 1: True, 3: False, 5: True}


def test_chunk_sequences_boundaries(spark):
    # 10 tokens, chunk_len=4, stride=3 -> starts 0,3,6,9
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "only two")], ["doc_id", "text"])
    out = CP.chunk_sequences(df, "text", "doc_id", chunk_len=4, stride=3)
    rows = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text) for r in out.collect()
    )
    assert rows == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),
        (2, 0, 2, "only two"),
    ]


def test_mixture_report_shares_sum_to_one(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c", "s1", "en"),
            (2, "d e", "s1", "en"),
            (3, "f g h i j", "s2", "fr"),
        ],
        ["doc_id", "text", "source", "lang"],
    )
    got = {
        (r.source, r.lang): r.asDict()
        for r in CP.mixture_report(df, ["source", "lang"], "text").collect()
    }
    assert got[("s1", "en")]["n_docs"] == 2
    assert got[("s1", "en")]["n_tokens"] == 5
    assert got[("s1", "en")]["token_share"] == 0.5
    assert got[("s2", "fr")]["token_share"] == 0.5
    assert sum(v["token_share"] for v in got.values()) == 1.0


# ---------------------------------------------------------------------------
# drop_duplicate_spans (substring-grain dedup)
# ---------------------------------------------------------------------------


def _spans(spark, rows, span_len=3, max_docs=1):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = CP.drop_duplicate_spans(
        df, "text", "doc_id", span_len=span_len, max_docs=max_docs
    )
    return {r["doc_id"]: r for r in out.collect()}


def test_span_dedup_drops_cross_doc_window_everywhere(spark):
    """A 3-token window shared by two docs removes its covered tokens
    from BOTH docs; unshared context survives in original order."""
    out = _spans(
        spark,
        [
            (1, "alpha beta gamma delta unique1 tail1"),
            (2, "front2 alpha beta gamma delta tail2"),
            (3, "totally different tokens here"),
        ],
    )
    # windows "alpha beta gamma", "beta gamma delta" are cross-doc dups:
    # covered tokens alpha..delta vanish from both docs
    assert out[1]["text"] == "unique1 tail1"
    assert out[1]["n_tokens_kept"] == 2 and out[1]["n_tokens_dropped"] == 4
    assert out[2]["text"] == "front2 tail2"
    assert out[3]["text"] == "totally different tokens here"
    assert out[3]["n_tokens_dropped"] == 0


def test_span_dedup_repeats_shorter_than_window_survive(spark):
    """A repeat shorter than span_len never forms a duplicate window, so
    it survives — the documented grain of the approximation."""
    out = _spans(
        spark,
        [(1, "common pair here aaa bbb"), (2, "common pair there ccc ddd")],
        span_len=3,
    )
    # "common pair" (2 tokens) < span_len: no shared 3-window exists
    assert out[1]["text"] == "common pair here aaa bbb"
    assert out[2]["text"] == "common pair there ccc ddd"


def test_span_dedup_intra_doc_repeat_survives(spark):
    """A window repeated only WITHIN one doc has countDistinct(doc) == 1
    and is not boilerplate."""
    out = _spans(spark, [(1, "x y z x y z"), (2, "p q r s t u")])
    assert out[1]["text"] == "x y z x y z"
    assert out[1]["n_tokens_dropped"] == 0


def test_span_dedup_fully_covered_doc_emits_empty_row(spark):
    """A doc whose every token is covered by duplicate windows still
    emits an output row (empty text), like line dedup does."""
    out = _spans(
        spark, [(1, "a b c"), (2, "a b c"), (3, "own words entirely")]
    )
    for i in (1, 2):
        assert out[i]["text"] == ""
        assert out[i]["n_tokens_kept"] == 0
        assert out[i]["n_tokens_dropped"] == 3
    assert out[3]["text"] == "own words entirely"


def test_span_dedup_short_and_null_docs_round_trip(spark):
    """Docs shorter than span_len have no windows and survive whole;
    NULL text round-trips like empty text (coalesce discipline)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, None), (3, "")], schema
    )
    out = {
        r["doc_id"]: r
        for r in CP.drop_duplicate_spans(
            df, "text", "doc_id", span_len=3
        ).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1]["text"] == "tiny doc" and out[1]["n_tokens_kept"] == 2
    for i in (2, 3):
        assert out[i]["text"] == ""
        assert out[i]["n_tokens_kept"] == 0
        assert out[i]["n_tokens_dropped"] == 0


def test_span_dedup_max_docs_threshold(spark):
    """max_docs=2 tolerates a window in two docs; three docs trips it."""
    rows = [
        (1, "shared run of words plus one"),
        (2, "shared run of words plus two"),
        (3, "shared run of words plus three"),
    ]
    tolerant = _spans(spark, rows, span_len=4, max_docs=2)
    assert tolerant[1]["n_tokens_dropped"] > 0  # 3 docs > max_docs=2
    strict2 = _spans(spark, rows[:2], span_len=4, max_docs=2)
    assert strict2[1]["text"] == rows[0][1]  # 2 docs <= max_docs=2


def test_duplicate_span_profile_matches_rewrite(spark):
    """The profile's n_covered must equal exactly the token count the
    rewrite would drop, doc by doc — it is the same verdict, stopped
    before the rebuild."""
    rows = [
        (1, "alpha beta gamma delta unique1 tail1"),
        (2, "front2 alpha beta gamma delta tail2"),
        (3, "totally different tokens here"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    prof = {
        r["doc_id"]: r
        for r in CP.duplicate_span_profile(
            df, "text", "doc_id", span_len=3
        ).collect()
    }
    rewrite = {
        r["doc_id"]: r
        for r in CP.drop_duplicate_spans(
            df, "text", "doc_id", span_len=3
        ).collect()
    }
    assert set(prof) == set(rewrite) == {1, 2, 3, 4}
    for i in prof:
        assert prof[i]["n_covered"] == rewrite[i]["n_tokens_dropped"], i
        assert (
            prof[i]["n_tokens"]
            == rewrite[i]["n_tokens_kept"] + rewrite[i]["n_tokens_dropped"]
        ), i
    assert prof[1]["coverage_frac"] == pytest.approx(4 / 6, abs=1e-4)
    assert prof[4]["n_tokens"] == 0 and prof[4]["coverage_frac"] == 0.0


def test_bloom_prefilter_no_false_negatives_and_mergeable(spark):
    """Bloom decontamination pre-filter invariants: (1) NO false
    negatives — every gram actually in the benchmark is maybe-flagged,
    so n_maybe_hits >= n_exact_hits per doc; (2) the positions-table
    representation merges by plain union — store(A ∪ B) ==
    store(A) ∪ store(B); (3) with a tiny bit space, false positives DO
    occur and are deterministic (md5-derived, rerun-stable)."""
    bench = spark.createDataFrame(
        [
            (100, "the quick brown fox jumps over the lazy dog"),
            (101, "pack my box with five dozen liquor jugs"),
        ],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # contains a verbatim bench 5-gram -> exact hit, must be flagged
            (1, "we say the quick brown fox jumps too"),
            (2, "completely unrelated training text with many words"),
        ],
        ["doc_id", "text"],
    )
    kw = dict(n=5, bits=1 << 12, hashes=3)
    store = CP.bloom_gram_store(bench, "text", "doc_id", **kw)
    out = {
        r["doc_id"]: r
        for r in CP.bloom_decontaminate(
            train, store, "text", "doc_id", **kw
        ).collect()
    }
    assert out[1]["n_maybe_hits"] >= 1  # the verbatim gram is caught
    for r in out.values():
        assert 0 <= r["n_maybe_hits"] <= r["n_grams"]

    # mergeability: union of stores == store of union
    s_a = CP.bloom_gram_store(
        bench.filter("doc_id = 100"), "text", "doc_id", **kw
    )
    s_b = CP.bloom_gram_store(
        bench.filter("doc_id = 101"), "text", "doc_id", **kw
    )
    merged = {r["bit_pos"] for r in s_a.union(s_b).distinct().collect()}
    full = {r["bit_pos"] for r in store.collect()}
    assert merged == full

    # determinism: a rerun flags the identical gram set
    again = {
        r["doc_id"]: r["n_maybe_hits"]
        for r in CP.bloom_decontaminate(
            train, store, "text", "doc_id", **kw
        ).collect()
    }
    assert again == {i: r["n_maybe_hits"] for i, r in out.items()}


def test_repetition_signals_known_answers(spark):
    """repetition_signals (round 6, Gopher filters): crafted docs with
    hand-computable answers — a fully repetitive doc saturates both
    fractions, varied prose scores low, and the bigram tie-break is
    lexicographic at equal counts."""
    from etl_gardener_spark.operators.corpus import repetition_signals

    rows = [
        # "spam spam spam spam": bigrams 3x "spam spam" (count 3),
        # trigrams 2x "spam spam spam" (both duplicated)
        (1, "spam spam spam spam"),
        # varied: every bigram/trigram unique
        (2, "alpha beta gamma delta epsilon"),
        # tie between bigrams "b c" and "a b"? counts: a b=1, b c=1,
        # c a=1, a d=1 -> all count 1, tie-break picks "a b"
        (3, "a b c a d"),
        (4, "x y"),  # too short (< 3 tokens): no row
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["top_bigram"],
            r["top_bigram_count"],
            r["top_bigram_char_frac"],
            r["dup_trigram_frac"],
        )
        for r in repetition_signals(df, "text", "doc_id").collect()
    }
    # doc 1: 4 tokens, 16 chars; top bigram "spam spam" (9 chars) x3
    # -> 27/16 capped? no cap: 27/16 = 1.6875; dup trigrams 2/2 = 1.0
    assert got[1] == (4, "spam spam", 3, 1.6875, 1.0)
    # doc 2: all unique -> count 1; "alpha beta" first lexicographically
    # among count-1 bigrams; frac 10/26 half-up at 4 dp = 0.3846;
    # dup trigrams 0/3 = 0
    assert got[2] == (5, "alpha beta", 1, 0.3846, 0.0)
    # doc 3: tie at count 1 -> lexicographic "a b" (3 chars), chars 5
    # -> 3/5 = 0.6; trigrams all unique
    assert got[3] == (5, "a b", 1, 0.6, 0.0)
    assert 4 not in got


def test_ngram_novelty_first_occurrence_semantics(spark):
    df = spark.createDataFrame(
        [
            # doc 0: 4 tokens -> 2 distinct trigrams, all first-seen
            (0, "a b c d"),
            # doc 1: verbatim copy of doc 0 -> 0 novel
            (1, "a b c d"),
            # doc 2: shares "b c d" with doc 0, adds "c d e" and "d e f"
            (2, "b c d e f"),
            # doc 3: too short for a trigram -> excluded
            (3, "x y"),
            # doc 4: fully fresh
            (4, "p q r s"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in CP.ngram_novelty(df, "text", "doc_id", n=3).collect()
    }
    assert got[0] == (2, 2, 1.0)
    assert got[1] == (2, 0, 0.0)
    # "b c d" first seen in doc 0 -> 2 of 3 novel; 2/3 half-up 4dp
    assert got[2] == (3, 2, 0.6667)
    assert 3 not in got
    assert got[4] == (2, 2, 1.0)


def test_matryoshka_truncation_recall_bounds(spark):
    from etl_gardener_spark.plans.queries_llm import (
        emb_matryoshka_recall_report,
    )
    from tests.conftest import SF_DIR

    rows = {
        r["dim"]: r for r in emb_matryoshka_recall_report(spark, SF_DIR).collect()
    }
    assert set(rows) == {16, 32}
    for dim, r in rows.items():
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_matched"] <= r["n_exact"]
    # prefix information is monotone in expectation; on the fixed test
    # corpus the 32-dim prefix must not recall WORSE than the 16-dim one
    assert rows[32]["recall"] >= rows[16]["recall"]


def test_doc_emb_dup_agreement_pinned(spark):
    from etl_gardener_spark.operators import neardup as ND

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),
            (1, "a b c d e"),  # verbatim dup of 0 -> jaccard 1.0
            (2, "p q r s t"),  # unrelated
        ],
        ["doc_id", "text"],
    )
    pairs = ND.jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    from pyspark.sql import functions as F
    from etl_gardener_spark.operators.similarity import cosine

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [1.0, 0.001, 0.0]),  # near-identical -> cosine ~1
            (2, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb"))
    cos = F.round(cosine(F.col("__va"), F.col("__vb")), 6)
    out = (
        pairs.join(va, "id_a").join(vb, "id_b")
        .select("id_a", "id_b", "jaccard", cos.alias("cosine"),
                (cos >= 0.9).alias("modal_agree"))
        .collect()
    )
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["jaccard"]) == (0, 1, 1.0)
    assert r["cosine"] > 0.99 and r["modal_agree"] is True


def test_char_trigram_nll_matches_python(spark):
    """char_trigram_nll equals a plain-python add-k trigram LM on a
    crafted store/batch pair, including OOV chars (unseen context ->
    uniform 1/V) and the <3-char exclusion."""
    import math

    from etl_gardener_spark.operators.corpus import char_trigram_nll

    store_rows = [(0, "abcabc"), (2, "abcd"), (4, "")]
    batch_rows = [(1, "abca"), (3, "zzzz"), (5, "ab")]
    store = spark.createDataFrame(store_rows, ["doc_id", "text"])
    batch = spark.createDataFrame(batch_rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_trigrams, r.avg_nll)
        for r in char_trigram_nll(store, batch, "text", "doc_id").collect()
    }

    # python mirror
    k = 0.5
    cnt, ctx_n, chars = {}, {}, set()
    for _i, s in store_rows:
        s = s.lower()
        chars.update(s)
        for p in range(len(s) - 2):
            key = (s[p : p + 2], s[p + 2])
            cnt[key] = cnt.get(key, 0) + 1
            ctx_n[s[p : p + 2]] = ctx_n.get(s[p : p + 2], 0) + 1
    v = float(len(chars))
    expect = {}
    for i, s in batch_rows:
        s = s.lower()
        if len(s) < 3:
            continue
        e6 = 0
        n = 0
        for p in range(len(s) - 2):
            c = cnt.get((s[p : p + 2], s[p + 2]), 0)
            nn = ctx_n.get(s[p : p + 2], 0)
            nll = -math.log((c + k) / (nn + k * v))
            e6 += math.floor(nll * 1e6 + 0.5)
            n += 1
        expect[i] = (n, math.floor(e6 / n / 1e6 * 10000 + 0.5) / 10000)
    assert out == expect
    assert 5 not in out  # < 3 chars -> no row
