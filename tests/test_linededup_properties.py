"""Property-based tests (hypothesis) for corpus line dedup
(corpus.drop_duplicate_lines): on arbitrary generated corpora, the result
must equal a plain-Python reference — every line whose normalized form
spans more than one doc is removed everywhere, survivors keep their
original relative order, counts partition each doc's lines, and the
operator is idempotent (a second pass drops nothing)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_gardener_spark.operators.corpus import drop_duplicate_lines

# small line alphabet -> frequent cross-doc collisions
line_strategy = st.sampled_from(
    ["alpha", "beta", "gamma", "Alpha", " beta ", "delta x", "epsilon", "", "  "]
)
doc_strategy = st.lists(line_strategy, min_size=1, max_size=6)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)


def _reference(docs: list[list[str]]):
    norm = lambda s: s.strip().lower()  # noqa: E731
    owners: dict[str, set[int]] = {}
    for i, lines in enumerate(docs):
        for ln in lines:
            owners.setdefault(norm(ln), set()).add(i)
    out = {}
    for i, lines in enumerate(docs):
        # blank lines are structure, never boilerplate-eligible
        kept = [
            ln for ln in lines if norm(ln) == "" or len(owners[norm(ln)]) <= 1
        ]
        out[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


@settings(max_examples=15, deadline=None)
@given(docs=corpus_strategy)
def test_line_dedup_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in drop_duplicate_lines(df, "text", "doc_id").collect()
    }
    assert got == _reference(docs)


@settings(max_examples=10, deadline=None)
@given(docs=corpus_strategy)
def test_line_dedup_is_idempotent(spark, docs):
    df = spark.createDataFrame(
        [(i, "\n".join(lines)) for i, lines in enumerate(docs)],
        ["doc_id", "text"],
    )
    once = drop_duplicate_lines(df, "text", "doc_id")
    twice = drop_duplicate_lines(
        once.select("doc_id", "text"), "text", "doc_id"
    )
    # every surviving line is now unique corpus-wide, so pass 2 keeps all
    assert {
        (r["doc_id"], r["text"]) for r in twice.collect()
    } == {(r["doc_id"], r["text"]) for r in once.collect()}
    assert twice.filter("n_lines_dropped > 0").count() == 0


@settings(max_examples=10, deadline=None)
@given(docs=corpus_strategy)
def test_incremental_line_dedup_equals_union_restricted_to_batch(spark, docs):
    """drop_duplicate_lines_incremental(batch, line_hash_store(history))
    must equal the FULL union dedup restricted to batch docs — the
    exactness claim that lets daily ingest skip rescanning history.
    History = even indices, batch = odd."""
    from etl_gardener_spark.operators.corpus import (
        drop_duplicate_lines_incremental,
        line_hash_store,
    )

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    history = df.filter("doc_id % 2 = 0")
    batch = df.filter("doc_id % 2 = 1")
    store = line_hash_store(history, "text", "doc_id")
    inc = {
        r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in drop_duplicate_lines_incremental(
            batch, store, "text", "doc_id"
        ).collect()
    }
    full = {
        i: v for i, v in _reference(docs).items() if i % 2 == 1
    }
    assert inc == full


def test_incremental_line_dedup_overlapping_doc_counts_history(spark):
    """Pin the documented doc-id-blind semantics (see the PRECONDITION
    on drop_duplicate_lines_incremental): re-ingesting a document whose
    prior version is already in the store double-counts it — its
    previously-stored lines, even ones unique to that one document, are
    dropped (store 1 + batch 1 = 2 > max_docs=1), while genuinely NEW
    lines of the same doc survive. This is intentionally NOT the
    union-dedup answer; exact union equivalence requires disjoint ids."""
    from etl_gardener_spark.operators.corpus import (
        drop_duplicate_lines_incremental,
        line_hash_store,
    )

    history = spark.createDataFrame(
        [(1, "only mine\nshared"), (2, "shared\nother doc line")],
        ["doc_id", "text"],
    )
    # doc 1 re-ingested: one line it already owns, one brand-new line
    batch = spark.createDataFrame(
        [(1, "only mine\nfresh line")], ["doc_id", "text"]
    )
    store = line_hash_store(history, "text", "doc_id")
    out = drop_duplicate_lines_incremental(
        batch, store, "text", "doc_id"
    ).collect()
    assert len(out) == 1
    row = out[0]
    # "only mine" is unique to doc 1 across history ∪ batch, but the
    # doc-id-blind store counts its prior copy as a distinct doc -> drop.
    assert row["text"] == "fresh line"
    assert row["n_lines_kept"] == 1 and row["n_lines_dropped"] == 1
