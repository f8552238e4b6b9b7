"""Property-based tests for training-sequence packing
(packing.pack_sequences): the distributed per-stratum fold must equal a
plain-Python next-fit reference on arbitrary generated inputs — the same
check that certified the operator at sf1 where the recursive-CTE SQL
oracle is intractable."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_gardener_spark.operators.packing import pack_sequences

CAP = 10

row_strategy = st.tuples(
    st.integers(min_value=0, max_value=40),      # doc_id (deduped below)
    st.sampled_from(["en", "de", "fr"]),          # stratum
    st.integers(min_value=1, max_value=CAP),      # weight <= capacity
)
rows_strategy = st.lists(row_strategy, min_size=1, max_size=25)


def _reference(rows):
    import collections

    by_lang = collections.defaultdict(list)
    for doc_id, lang, nt in sorted(rows):
        by_lang[lang].append((doc_id, nt))
    ref = {}
    for lang, docs in by_lang.items():
        bin_id, fill, first = 0, 0, True
        for doc_id, nt in docs:
            if first:
                fill, first = nt, False
            elif fill + nt > CAP:
                bin_id, fill = bin_id + 1, nt
            else:
                fill += nt
            ref[doc_id] = (lang, nt, bin_id)
    return ref


@settings(max_examples=10, deadline=None)
@given(rows_strategy)
def test_pack_sequences_matches_python_next_fit(spark, rows):
    # dedupe ids (one row per doc)
    uniq = {}
    for doc_id, lang, nt in rows:
        uniq[doc_id] = (doc_id, lang, nt)
    rows = list(uniq.values())
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {
        r["doc_id"]: (r["lang"], r["n_tokens"], r["bin_id"])
        for r in pack_sequences(
            df, "doc_id", "n_tokens", ["lang"], capacity=CAP
        ).collect()
    }
    assert out == _reference(rows)


def test_pack_efficiency_counts_overflow_bins(spark):
    """The efficiency rollup must count a doc heavier than capacity as
    its own overflow bin and report the exact fill arithmetic."""
    from pyspark.sql import functions as F

    from etl_gardener_spark.operators.packing import pack_sequences

    capacity = 400
    rows = [(1, "en", 300), (2, "en", 300), (3, "en", 500), (4, "en", 100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    packed = pack_sequences(
        df, "doc_id", "n_tokens", ["lang"], capacity=capacity
    )
    per_bin = packed.groupBy("lang", "bin_id").agg(
        F.sum("n_tokens").cast("long").alias("fill")
    )
    fills = {r.bin_id: r.fill for r in per_bin.collect()}
    # next-fit over ids: [300], [300], [500] (overflow alone), [100]
    assert fills == {0: 300, 1: 300, 2: 500, 3: 100}
    assert sum(f > capacity for f in fills.values()) == 1


def test_pack_sequences_string_ids(spark):
    """id_type='string' packs warehouse string-id tables: lexicographic
    order within the stratum, same greedy fill rule."""
    from etl_gardener_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [("a", "s", 30), ("b", "s", 30), ("c", "s", 50), ("d", "s", 90)],
        ["id", "stratum", "w"],
    )
    out = {
        r.id: r.bin_id
        for r in pack_sequences(
            df, "id", "w", ["stratum"], 70, id_type="string"
        ).collect()
    }
    # a(30)+b(30)=60 <= 70; c(50) opens bin 1; d(90) > capacity alone in 2
    assert out == {"a": 0, "b": 0, "c": 1, "d": 2}
