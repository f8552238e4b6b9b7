"""Property-based tests (hypothesis) for substring-span dedup
(corpus.drop_duplicate_spans): on arbitrary generated corpora the result
must equal a plain-Python reference — every token covered by a window
whose content spans more than max_docs docs is removed everywhere,
survivors keep original order, counts partition each doc's tokens, and
the profile operator predicts the rewrite exactly."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_gardener_spark.operators.corpus import (
    drop_duplicate_spans,
    duplicate_span_profile,
)

L = 3  # window length under test

# tiny token alphabet -> frequent cross-doc window collisions
tok_strategy = st.sampled_from(["a", "b", "c", "d", "e"])
doc_strategy = st.lists(tok_strategy, min_size=0, max_size=9)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=5)


def _reference(docs: list[list[str]], max_docs: int = 1):
    owners: dict[str, set[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(max(len(toks) - L + 1, 0)):
            owners.setdefault(" ".join(toks[p : p + L]), set()).add(i)
    dup = {w for w, ds in owners.items() if len(ds) > max_docs}
    out = {}
    for i, toks in enumerate(docs):
        covered: set[int] = set()
        for p in range(max(len(toks) - L + 1, 0)):
            if " ".join(toks[p : p + L]) in dup:
                covered.update(range(p, p + L))
        kept = [t for j, t in enumerate(toks) if j not in covered]
        out[i] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(corpus_strategy)
def test_span_dedup_matches_python_reference(spark, corpus):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(corpus)]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in drop_duplicate_spans(
            df, "text", "doc_id", span_len=L
        ).collect()
    }
    assert got == _reference(corpus)
    # the profile predicts the rewrite exactly, doc by doc
    prof = {
        r["doc_id"]: r["n_covered"]
        for r in duplicate_span_profile(
            df, "text", "doc_id", span_len=L
        ).collect()
    }
    assert prof == {i: v[2] for i, v in _reference(corpus).items()}


@settings(max_examples=6, deadline=None)
@given(corpus_strategy)
def test_span_dedup_idempotent(spark, corpus):
    """A second pass over the survivors drops nothing: removing spans
    cannot create new cross-doc window collisions at the same grain
    UNLESS removal juxtaposes previously-separated tokens — so
    idempotence is asserted on the reference semantics, where the first
    pass's output is re-fed and must lose no FURTHER tokens than a
    direct second reference pass."""
    first = _reference(corpus)
    survivors = [first[i][0].split() for i in sorted(first)]
    second = _reference(survivors)
    rows = [(i, " ".join(toks)) for i, toks in enumerate(survivors)]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in drop_duplicate_spans(
            df, "text", "doc_id", span_len=L
        ).collect()
    }
    assert got == second
