"""Streaming sink test: the continuously-maintained warehouse rollup must
equal the batch rollup, land day-partitioned, and survive a restart from
the checkpoint without duplicating results (idempotent partition
overwrite)."""

from __future__ import annotations

from etl_gardener_spark.plans import queries as Q
from etl_gardener_spark.streaming.events import read_events_stream
from etl_gardener_spark.streaming.sink import stream_hourly_rollup_to_warehouse
from etl_gardener_spark.warehouse import Warehouse

SF = "/root/testdata/sf0.001"


def _stream(spark):
    return read_events_stream(spark, SF)


def _run_once(spark, wh, ckpt):
    q = stream_hourly_rollup_to_warehouse(
        _stream(spark), wh, "ndt", "hourly", checkpoint_dir=ckpt
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_sink_matches_batch_and_is_idempotent(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    _run_once(spark, wh, ckpt)

    got = wh.read(spark, "join", "ndt", "hourly")
    batch = Q.REGISTRY["hourly_rollup"].fn(spark, SF)
    g = {(r.hour, r.event_type): (r.n, r.total_value) for r in got.collect()}
    b = {(r.hour, r.event_type): (r.n, r.total_value) for r in batch.collect()}
    assert g == b
    # partitioned by day on disk
    days = {r.date for r in got.select("date").distinct().collect()}
    assert len(days) >= 2

    # restart from the same checkpoint: no new data -> no duplication,
    # results unchanged (idempotent partition overwrite)
    _run_once(spark, wh, ckpt)
    again = {
        (r.hour, r.event_type): (r.n, r.total_value)
        for r in wh.read(spark, "join", "ndt", "hourly").collect()
    }
    assert again == b
