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
