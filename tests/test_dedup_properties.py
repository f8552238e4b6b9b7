"""Property-based tests (hypothesis) for the dedup core: on arbitrary
generated event sets, keep-best must equal the groupwise argmax computed in
plain Python, keep+delete must partition the input, and dedup must be
idempotent — the invariant the reference's restartable pipeline relies on
(ops/ops.go:33-40)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st

from etl_gardener_spark.operators.dedup import (
    DedupSpec,
    dedup_delete_set,
    dedup_keep_best,
)

BASE = datetime(2024, 3, 1)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),      # key
        st.integers(min_value=0, max_value=50),     # ts offset (collisions likely)
        st.integers(min_value=0, max_value=10**6),  # uid (unique-ified below)
    ),
    min_size=1,
    max_size=40,
)

SPEC = DedupSpec(
    partition_keys={"k": "k"},
    order_keys=[("ts", False), ("uid", False)],
    date_col=None,
)


def _df(spark, rows):
    uniq = [
        (k, BASE + timedelta(minutes=t), i * 10**7 + u)
        for i, (k, t, u) in enumerate(rows)
    ]
    return spark.createDataFrame(uniq, ["k", "ts", "uid"])


@settings(max_examples=20, deadline=None)
@given(rows=rows_strategy)
def test_keep_best_is_groupwise_argmax(spark, rows):
    df = _df(spark, rows)
    data = [(r.k, r.ts, r.uid) for r in df.collect()]
    expect = {}
    for k, ts, uid in data:
        if k not in expect or (ts, uid) > (expect[k][1], expect[k][2]):
            expect[k] = (k, ts, uid)
    kept = {(r.k, r.ts, r.uid) for r in dedup_keep_best(df, SPEC).collect()}
    assert kept == set(expect.values())

    # keep ⊎ delete == input
    deleted = {(r.k, r.ts, r.uid) for r in dedup_delete_set(df, SPEC).collect()}
    assert kept | deleted == set(data)
    assert not (kept & deleted)

    # idempotence: dedup of the survivors is a no-op
    again = {
        (r.k, r.ts, r.uid)
        for r in dedup_keep_best(_df_from(spark, kept), SPEC).collect()
    }
    assert again == kept


def _df_from(spark, triples):
    return spark.createDataFrame(sorted(triples), ["k", "ts", "uid"])
