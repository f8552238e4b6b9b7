"""Concurrency evidence for the day-partition isolation claim (SCALE.md:
"days are independent, so a backfill parallelizes across dates with zero
write conflicts"): full Load->Dedup->Copy->Delete pipelines for several
days run in PARALLEL THREADS against ONE warehouse and must produce
exactly the serial result, plus crash-recovery of an interrupted
forget_keys staged swap."""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
from datetime import date

import pytest
from pyspark.sql import types as T

from etl_gardener_spark.table_ops import JobSpec, TableOps
from etl_gardener_spark.warehouse import Warehouse, vacuum_staging

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField(
            "parser", T.StructType([T.StructField("Time", T.TimestampType())])
        ),
        T.StructField("v", T.DoubleType()),
    ]
)


def _land(root: str, day: str, n_ids: int) -> str:
    prefix = os.path.join(root, day.replace("-", "/"))
    os.makedirs(prefix, exist_ok=True)
    with open(os.path.join(prefix, "part0.jsonl"), "w") as f:
        for i in range(n_ids):
            # two copies per id; latest parser.Time must win dedup
            for c in (1, 2):
                f.write(
                    json.dumps(
                        {
                            "id": f"{day}-id{i}",
                            "parser": {"Time": f"{day}T0{c}:00:00Z"},
                            "v": float(i * 10 + c),
                        }
                    )
                    + "\n"
                )
    return prefix


DAYS = ["2024-03-01", "2024-03-02", "2024-03-03"]


def test_concurrent_day_pipelines_do_not_interfere(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    prefixes = {d: _land(str(tmp_path / "landing"), d, n_ids=20) for d in DAYS}

    def run_day(d: str) -> int:
        job = JobSpec(experiment="exp", datatype="t", date=date.fromisoformat(d))
        ops = TableOps(spark, wh, job)
        ops.load_to_tmp(prefixes[d], SCHEMA)
        ops.dedup()
        st = ops.copy_to_raw()
        ops.delete_tmp()
        return st.rows_out

    with cf.ThreadPoolExecutor(max_workers=len(DAYS)) as ex:
        results = dict(zip(DAYS, ex.map(run_day, DAYS)))

    assert all(n == 20 for n in results.values()), results
    raw = wh.read(spark, "raw", "exp", "t")
    assert raw.count() == 60
    # every id kept its LATEST copy (c=2), day isolation intact
    rows = {r.id: (str(r.date), r.v) for r in raw.collect()}
    for d in DAYS:
        for i in range(20):
            day_str, v = rows[f"{d}-id{i}"]
            assert day_str == d and v == float(i * 10 + 2)
    # no tmp partitions or staging leftovers survive
    for d in DAYS:
        assert not wh.partition_exists(
            spark, "tmp", "exp", "t", date.fromisoformat(d)
        )
    assert vacuum_staging(spark, str(tmp_path / "wh"), min_age_sec=0) == []


def test_forget_keys_recovers_from_orphan_staging(spark, tmp_path):
    """A crash between staged write and swap leaves *.__forgetting__; the
    live partition is untouched, vacuum sweeps the orphan, and a rerun
    completes the deletion."""
    from pyspark.sql import functions as F

    wh = Warehouse(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, "2024-03-01") for i in range(10)], ["user_id", "d"]
    ).select("user_id", F.col("d").cast("date").alias("date"))
    wh.append(df, "raw", "exp", "t")
    day = date(2024, 3, 1)
    # simulate the crash artifact (underscore-prefixed staging sibling)
    from etl_gardener_spark.warehouse import _staged_path

    staged = _staged_path(
        wh.partition_path("raw", "exp", "t", day), "forgetting"
    )
    os.makedirs(staged, exist_ok=True)
    with open(os.path.join(staged, "part-stale.parquet"), "w") as f:
        f.write("garbage")
    # live partition unaffected by the orphan
    assert wh.read(spark, "raw", "exp", "t").count() == 10
    swept = vacuum_staging(spark, str(tmp_path / "wh"), min_age_sec=0)
    assert any(p.endswith(".__forgetting__") for p in swept)
    keys = spark.createDataFrame([(3,), (7,)], ["user_id"])
    stats = wh.forget_keys(spark, "raw", "exp", "t", keys, "user_id")
    assert stats["rows_removed"] == 2
    left = {r["user_id"] for r in wh.read(spark, "raw", "exp", "t").collect()}
    assert left == set(range(10)) - {3, 7}
