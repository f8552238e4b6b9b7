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
