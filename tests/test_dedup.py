"""Dedup operator tests: active template semantics (Q1) and the legacy
variants (Q3-Q5) on synthetic nested-schema fixtures, checked row-for-row,
plus oracle checks on the driver's events table."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_gardener_spark.operators.dedup import (
    LEGACY_NDT,
    LEGACY_SIDESTREAM,
    LEGACY_TRACEROUTE,
    DedupSpec,
    active_spec,
    dedup_delete_set,
    dedup_keep_best,
)

from tests.conftest import assert_matches_oracle


def _ndt7_rows():
    """F1 fixture: duplicate ids within a day (dedup), same id across days
    (must NOT dedup) — FIXTURES.md F1."""
    d1, d2 = date(2024, 3, 1), date(2024, 3, 2)
    t = lambda h, m=0: datetime(2024, 3, 1, h, m)
    mk = lambda id_, dt, pt, val: Row(
        id=id_, date=dt, parser=Row(Time=pt), a=Row(MeanThroughputMbps=val), raw="x" * 4
    )
    return [
        mk("a", d1, t(1), 1.0),
        mk("a", d1, t(5), 2.0),   # winner for (a, d1): latest parser.Time
        mk("a", d1, t(3), 3.0),
        mk("b", d1, t(2), 4.0),   # singleton
        mk("a", d2, t(4), 5.0),   # same id, other day: kept independently
        mk("c", d2, t(1), 6.0),
        mk("c", d2, t(1, 30), 7.0),  # winner for (c, d2)
    ]


def test_active_dedup_keeps_latest_parser_time(spark):
    df = spark.createDataFrame(_ndt7_rows())
    out = dedup_keep_best(df, active_spec("ndt7")).collect()
    got = {(r.id, str(r.date)): r.a.MeanThroughputMbps for r in out}
    assert got == {
        ("a", "2024-03-01"): 2.0,
        ("b", "2024-03-01"): 4.0,
        ("a", "2024-03-02"): 5.0,
        ("c", "2024-03-02"): 7.0,
    }
    # schema passes through unchanged (SELECT * EXCEPT(row_number))
    assert [f.name for f in spark.createDataFrame(_ndt7_rows()).schema.fields] == [
        f.name for f in dedup_keep_best(df, active_spec("ndt7")).schema.fields
    ]


def test_delete_set_is_complement(spark):
    df = spark.createDataFrame(_ndt7_rows())
    spec = active_spec("ndt7")
    kept = dedup_keep_best(df, spec).count()
    deleted = dedup_delete_set(df, spec).count()
    assert kept + deleted == df.count()
    assert deleted == 3


def test_unsupported_datatype_rejected():
    with pytest.raises(ValueError):
        active_spec("nope")


def test_legacy_ndt_gz_normalization(spark):
    """Q3: key strips .gz; priority num_snaps DESC then gz DESC
    (cloud/bq/dedup.go:23-38)."""
    rows = [
        Row(test_id="t1.gz", parse_time=datetime(2024, 1, 1, 1), task_filename="f1",
            anomalies=Row(num_snaps=10, no_meta=False)),
        Row(test_id="t1", parse_time=datetime(2024, 1, 1, 2), task_filename="f1",
            anomalies=Row(num_snaps=10, no_meta=False)),  # loses: gz DESC prefers .gz
        Row(test_id="t2", parse_time=datetime(2024, 1, 1, 1), task_filename="f1",
            anomalies=Row(num_snaps=5, no_meta=False)),
        Row(test_id="t2.gz", parse_time=datetime(2024, 1, 1, 2), task_filename="f1",
            anomalies=Row(num_snaps=9, no_meta=False)),  # wins: more snaps
    ]
    out = dedup_keep_best(spark.createDataFrame(rows), LEGACY_NDT).collect()
    winners = {r.test_id for r in out}
    assert winners == {"t1.gz", "t2.gz"}


def test_legacy_sidestream_five_tuple_key(spark):
    mk = lambda tid, st, lp, pt: Row(
        test_id=tid,
        parse_time=pt,
        web100_log_entry=Row(
            snap=Row(StartTimeStamp=st),
            connection_spec=Row(
                local_ip="10.0.0.1", local_port=lp, remote_ip="10.0.0.2", remote_port=9
            ),
        ),
    )
    rows = [
        mk("s1", 100, 1, datetime(2024, 1, 1, 1)),
        mk("s1", 100, 1, datetime(2024, 1, 1, 2)),  # same key: later wins
        mk("s1", 100, 2, datetime(2024, 1, 1, 1)),  # different local_port: kept
    ]
    out = dedup_keep_best(spark.createDataFrame(rows), LEGACY_SIDESTREAM).collect()
    assert len(out) == 2
    assert {r.parse_time.hour for r in out} == {2, 1}


def test_legacy_traceroute_key(spark):
    tt = datetime(2024, 1, 1, 0)
    mk = lambda src, pt: Row(
        TestTime=tt, Source=Row(IP=src), Destination=Row(IP="8.8.8.8"),
        ParseInfo=Row(ParseTime=pt),
    )
    rows = [
        mk("1.1.1.1", datetime(2024, 1, 2, 1)),
        mk("1.1.1.1", datetime(2024, 1, 2, 9)),  # wins
        mk("2.2.2.2", datetime(2024, 1, 2, 1)),
    ]
    out = dedup_keep_best(spark.createDataFrame(rows), LEGACY_TRACEROUTE).collect()
    assert len(out) == 2


def test_dedup_against_duckdb_oracle(spark, duck):
    """Computed-key dedup over the driver's events table vs DuckDB."""
    from tests.conftest import SF_DIR
    from etl_gardener_spark.sources.tables import load_table

    df = load_table(spark, SF_DIR, "events")
    spec = DedupSpec(
        partition_keys={"user_id": "user_id", "event_type": "event_type"},
        order_keys=[("ts", False), ("event_id", False)],
        date_col=None,
    )
    out = dedup_keep_best(df, spec)
    assert_matches_oracle(
        out,
        duck,
        """
        SELECT event_id, ts, user_id, event_type, value, props FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) rn
          FROM events) WHERE rn = 1
        """,
    )
