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


# ---------------------------------------------------------------------------
# Miss-rate certificate vs EXACT substring dedup (r8 verdict item 5):
# the fixed-window pass is compared against a brute-force suffix-array-
# style oracle that enumerates duplicated substrings of EVERY length.
# ---------------------------------------------------------------------------


def _exact_covered(
    docs: list[list[str]],
    min_len: int,
    max_docs: int = 1,
    count_within_doc: bool = False,
) -> dict[int, set[int]]:
    """Brute-force exact-substring-dedup oracle: the set of token
    positions per doc covered by ANY duplicated token-substring of
    length >= min_len. ``count_within_doc=False`` counts distinct DOCS
    per substring (the operator's verdict rule); True counts total
    occurrences, the full suffix-array semantics where a substring
    repeated inside ONE doc also qualifies."""
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i, toks in enumerate(docs):
        for ln in range(min_len, len(toks) + 1):
            for p in range(len(toks) - ln + 1):
                occ.setdefault(tuple(toks[p : p + ln]), []).append((i, p))
    covered: dict[int, set[int]] = {i: set() for i in range(len(docs))}
    for sub, places in occ.items():
        if count_within_doc:
            dup = len(places) > max_docs
        else:
            dup = len({i for i, _ in places}) > max_docs
        if dup:
            for i, p in places:
                covered[i].update(range(p, p + len(sub)))
    return covered


def _window_covered(
    docs: list[list[str]], max_docs: int = 1
) -> dict[int, set[int]]:
    """Token positions the fixed-window operator removes — the same
    window rule _reference applies (and _reference matches
    drop_duplicate_spans exactly per the property test above), exposed
    as position sets rather than rebuilt text."""
    owners: dict[str, set[int]] = {}
    for i, toks in enumerate(docs):
        for p in range(max(len(toks) - L + 1, 0)):
            owners.setdefault(" ".join(toks[p : p + L]), set()).add(i)
    dup = {w for w, ds in owners.items() if len(ds) > max_docs}
    out: dict[int, set[int]] = {}
    for i, toks in enumerate(docs):
        covered: set[int] = set()
        for p in range(max(len(toks) - L + 1, 0)):
            if " ".join(toks[p : p + L]) in dup:
                covered.update(range(p, p + L))
        out[i] = covered
    return out


@settings(max_examples=15, deadline=None)
@given(corpus_strategy)
def test_window_pass_is_exact_for_cross_doc_repeats(spark, corpus):
    """CERTIFICATE: at token grain, the fixed-window pass removes
    EXACTLY the tokens lying in some cross-doc duplicated substring of
    length >= span_len — i.e. for the cross-doc, distinct-docs verdict
    rule the window approximation is not an approximation at all.
    (Every duplicated substring of length R >= L is tiled by its R-L+1
    duplicated L-windows; every duplicated L-window IS a duplicated
    substring of length L.) Pure-python proof check on random corpora;
    the operator itself equals _reference by the property test above."""
    exact = _exact_covered(corpus, min_len=L, max_docs=1)
    window = _window_covered(corpus)
    assert window == exact


@settings(max_examples=15, deadline=None)
@given(corpus_strategy)
def test_window_pass_miss_profile(spark, corpus):
    """MISS PROFILE vs the FULL suffix-array semantics (any second
    occurrence qualifies, including within one doc, down to length
    L - 1). Two independently-computed directions:
      * no over-removal — every token the window pass removes lies in
        SOME genuinely duplicated substring (the pass never invents a
        duplicate the full semantics wouldn't flag);
      * no misses in the claimed class — tokens the pass misses are
        NEVER part of a cross-doc duplicated substring of length >= L
        (those are exactly what the docstring promises to remove);
        what remains missable is only (a) repeats shorter than L and
        (b) within-one-doc-only repeats — the two documented classes,
        shown concrete in test_window_pass_pinned_miss_examples."""
    full = _exact_covered(
        corpus, min_len=L - 1, max_docs=1, count_within_doc=True
    )
    crossdoc = _exact_covered(corpus, min_len=L, max_docs=1)
    window = _window_covered(corpus)
    for i in full:
        assert window[i] <= full[i], (i, window[i] - full[i], corpus)
        missed = full[i] - window[i]
        assert not (missed & crossdoc[i]), (i, missed & crossdoc[i], corpus)


def test_window_pass_pinned_miss_examples(spark):
    """The two miss classes on concrete corpora (documentation-grade):
    a cross-doc bigram repeat (< L=3) survives; a within-doc trigram
    repeat survives; the same trigram ACROSS docs is removed."""
    # (a) cross-doc repeat of length 2 < L: survives everywhere
    docs_a = [["x", "y", "a", "b"], ["c", "x", "y", "d"]]
    assert _window_covered(docs_a) == {0: set(), 1: set()}
    assert _exact_covered(docs_a, min_len=2)[0] == {0, 1}
    # (b) within-doc trigram repeat: survives (distinct-docs rule)
    docs_b = [["a", "b", "c", "z", "a", "b", "c"]]
    assert _window_covered(docs_b) == {0: set()}
    assert _exact_covered(docs_b, min_len=3, count_within_doc=True)[0] == {
        0, 1, 2, 4, 5, 6,
    }
    # control: the same trigram across two docs IS removed, fully
    docs_c = [["a", "b", "c", "z"], ["q", "a", "b", "c"]]
    assert _window_covered(docs_c) == {0: {0, 1, 2}, 1: {1, 2, 3}}
