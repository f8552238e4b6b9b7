"""Streaming scrub+split ingestion (streaming/ingest.py): sink layout,
stream/batch equivalence, and exactly-once restart semantics."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etl_gardener_spark.streaming.ingest import (
    read_documents_stream,
    scrub_split_to_parquet,
    scrub_split_transform,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "out"), str(tmp_path / "ckpt")


def _run(spark, out, ckpt):
    q = scrub_split_to_parquet(read_documents_stream(spark, SF), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_sink_layout_and_batch_equivalence(spark, dirs):
    out, ckpt = dirs
    _run(spark, out, ckpt)
    subdirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert subdirs <= {"split=train", "split=val", "split=test"}
    assert "split=train" in subdirs  # 96% bucket can't be empty
    got = spark.read.parquet(out)
    batch = scrub_split_transform(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    )
    assert got.count() == batch.count()
    # identical per-doc scrub output + split assignment as the batch path
    g = {r["doc_id"]: (r["text"], r["split"], r["n_email"]) for r in got.collect()}
    b = {r["doc_id"]: (r["text"], r["split"], r["n_email"]) for r in batch.collect()}
    assert g == b


def test_restart_is_exactly_once(spark, dirs):
    out, ckpt = dirs
    _run(spark, out, ckpt)
    n1 = spark.read.parquet(out).count()
    # same checkpoint, same input: the restarted stream must not re-emit
    _run(spark, out, ckpt)
    assert spark.read.parquet(out).count() == n1


def test_jsonl_dlq_routes_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from etl_gardener_spark.streaming.ingest import jsonl_ingest_with_dlq

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.jsonl").write_text(
        '{"id": 1, "v": "x"}\n'
        "this is not json\n"
        '{"id": 2, "v": "y"}\n'
        '{"id": broken\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, dlq, ckpt = str(tmp_path / "good"), str(tmp_path / "dlq"), str(tmp_path / "ck")
    q = jsonl_ingest_with_dlq(spark, str(landing), schema, good, dlq, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["id"], r["v"]) for r in spark.read.parquet(good).collect()}
    assert got == {(1, "x"), (2, "y")}
    bad = {r["raw_line"] for r in spark.read.parquet(dlq).collect()}
    assert bad == {"this is not json", '{"id": broken'}

    # restart with same checkpoint: no re-emission, batch dirs unchanged
    q2 = jsonl_ingest_with_dlq(spark, str(landing), schema, good, dlq, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert spark.read.parquet(good).count() == 2
    assert spark.read.parquet(dlq).count() == 2


def test_nanos_conf_restored_after_stream_consumers(spark):
    """Round-6 verdict item 5: read_events_stream scopes
    spark.sql.legacy.parquet.nanosAsLong to the source definition and
    restores the previous session value — a full define+start+drain
    cycle must leave the conf untouched AND still produce rows (the
    parquet relation captures its read config at .load())."""
    from etl_gardener_spark.streaming.events import stream_hourly_rollup

    key = "spark.sql.legacy.parquet.nanosAsLong"
    sf = "/root/testdata/sf0.001"
    # case 1: conf previously unset/false -> stays false after a drain
    spark.conf.set(key, "false")
    out = stream_hourly_rollup(spark, sf)
    assert out.count() > 0
    assert spark.conf.get(key) == "false"
    # case 2: user had it true -> stays true
    spark.conf.set(key, "true")
    out = stream_hourly_rollup(spark, sf)
    assert out.count() > 0
    assert spark.conf.get(key) == "true"
    spark.conf.unset(key)
