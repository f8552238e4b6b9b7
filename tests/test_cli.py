"""CLI smoke tests for the load/copy subcommands (the reference's
standalone binaries cmd/load and cmd/copy) run in-process — ``_spark()``
getOrCreate's the shared test session, so no second JVM boots."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import types as T

from etl_gardener_spark.cli import main

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def test_cli_load_then_copy(spark, tmp_path, capsys):
    landing = tmp_path / "landing" / "2024" / "01" / "15"
    landing.mkdir(parents=True)
    rows = [
        {"id": "a", "ts": "2024-01-15T01:00:00.000000Z", "v": 1.0},
        {"id": "b", "ts": "2024-01-15T02:00:00.000000Z", "v": 2.0},
        {"id": "c", "ts": "2024-01-15T03:00:00.000000Z", "v": 3.0},
    ]
    (landing / "part-0.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )
    schema_file = tmp_path / "schema.json"
    schema_file.write_text(json.dumps(SCHEMA.jsonValue()))
    wh = str(tmp_path / "wh")

    common = [
        "--warehouse", wh,
        "--experiment", "exp",
        "--datatype", "thing",
        "--date", "2024-01-15",
    ]
    rc = main(
        ["load", "--source", str(landing), "--schema", str(schema_file)]
        + common
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["rows_out"] == 3

    rc = main(["copy"] + common)
    assert rc == 0

    from etl_gardener_spark.warehouse import Warehouse

    raw = Warehouse(wh).read(spark, "raw", "exp", "thing")
    got = sorted(
        (r["id"], r["v"], r["ts"]) for r in raw.collect()
    )
    assert [g[0] for g in got] == ["a", "b", "c"]
    assert got[0][2] == datetime(2024, 1, 15, 1, 0, 0)


def test_cli_copy_dry_run_no_write(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh2")
    landing = tmp_path / "l2"
    landing.mkdir()
    (landing / "p.jsonl").write_text(
        '{"id": "x", "ts": "2024-01-15T01:00:00.000000Z", "v": 9.0}\n'
    )
    schema_file = tmp_path / "s2.json"
    schema_file.write_text(json.dumps(SCHEMA.jsonValue()))
    common = [
        "--warehouse", wh,
        "--experiment", "exp",
        "--datatype", "thing",
        "--date", "2024-01-15",
    ]
    assert main(["load", "--source", str(landing), "--schema", str(schema_file)] + common) == 0
    capsys.readouterr()
    assert main(["copy", "--dry-run"] + common) == 0
    out = capsys.readouterr().out
    assert out.strip()  # plan/stats emitted

    from etl_gardener_spark.warehouse import Warehouse

    assert not Warehouse(wh).path_exists(
        spark, Warehouse(wh).table_path("raw", "exp", "thing")
    )


def test_cli_backfill_date_range(spark, tmp_path, capsys):
    """`backfill` drives T1-T5 for every (source, date) in the range and
    exits 0 with all jobs Complete — the historical sweep as one
    synchronous command."""
    import json as _json

    cfg = tmp_path / "config.yml"
    cfg.write_text(
        """
start_date: 2024-03-01
sources:
  - bucket: b
    experiment: ndt
    datatype: ndt7
    datasets: {tmp: tmp_ndt, raw: raw_ndt, join: ndt}
"""
    )
    gschema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField(
                "parser", T.StructType([T.StructField("Time", T.TimestampType())])
            ),
            T.StructField("value", T.DoubleType()),
        ]
    )
    schema_file = tmp_path / "gschema.json"
    schema_file.write_text(_json.dumps(gschema.jsonValue()))
    landing = tmp_path / "landing"
    for day in ("01", "02"):
        d = landing / "b" / "ndt" / "ndt7" / "2024" / "03" / day
        d.mkdir(parents=True)
        rows = [
            {"id": "a", "parser": {"Time": f"2024-03-{day}T01:00:00Z"}, "value": 1.0},
            {"id": "a", "parser": {"Time": f"2024-03-{day}T02:00:00Z"}, "value": 2.0},
        ]
        (d / "p.jsonl").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")

    rc = main(
        [
            "backfill",
            "--config", str(cfg),
            "--warehouse", str(tmp_path / "wh"),
            "--landing", str(landing),
            "--schema", str(schema_file),
            "--state-dir", str(tmp_path / "state"),
            "--start", "2024-03-01",
            "--end", "2024-03-02",
            "--timeout", "240",
        ]
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["drained"]
    assert set(out["jobs"].values()) == {"complete"}

    from datetime import date as Date

    from etl_gardener_spark.warehouse import Warehouse

    wh = Warehouse(str(tmp_path / "wh"))
    for day in (1, 2):
        raw = wh.read_partition(spark, "raw", "ndt", "ndt7", Date(2024, 3, day))
        assert raw.count() == 1  # deduped to latest parser.Time

    # rerun over the same range (completed jobs re-seed, stages replace
    # their own partitions): exit 0 again, no row duplication
    rc = main(
        [
            "backfill",
            "--config", str(cfg),
            "--warehouse", str(tmp_path / "wh"),
            "--landing", str(landing),
            "--schema", str(schema_file),
            "--state-dir", str(tmp_path / "state"),
            "--start", "2024-03-01",
            "--end", "2024-03-02",
            "--timeout", "240",
        ]
    )
    assert rc == 0
    for day in (1, 2):
        assert wh.read_partition(
            spark, "raw", "ndt", "ndt7", Date(2024, 3, day)
        ).count() == 1

    # invalid range is a usage error, not a fake failure
    rc = main(
        [
            "backfill",
            "--config", str(cfg),
            "--warehouse", str(tmp_path / "wh"),
            "--landing", str(landing),
            "--schema", str(schema_file),
            "--state-dir", str(tmp_path / "state2"),
            "--start", "2024-03-05",
            "--end", "2024-03-01",
        ]
    )
    assert rc == 2


def test_cli_explain_prints_plan_and_lists(capsys):
    from etl_gardener_spark.cli import main

    assert main(["explain", "list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "dedup_keep_best" in out

    assert main(["explain", "q1_pricing_summary"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "PushedFilters" in out

    assert main(["explain", "no_such_query"]) == 2


def test_cli_vacuum_and_recover(spark, tmp_path, capsys):
    """The warehouse-hygiene subcommands: `recover` completes an
    interrupted staged swap (committed staging dir, missing target);
    `vacuum --min-age 0` removes a torn staging orphan."""
    import os

    from pyspark.sql import functions as F

    from etl_gardener_spark.warehouse import Warehouse, _staged_path

    wh = Warehouse(str(tmp_path / "wh"))
    from datetime import date as D

    day = D(2024, 3, 9)
    df = spark.createDataFrame([("a", 1.0)], "id string, v double").withColumn(
        "date", F.lit(day.isoformat()).cast("date")
    )
    wh.overwrite_partitions(df, "raw", "ndt", "ndt7")
    part = wh.partition_path("raw", "ndt", "ndt7", day)
    staged = _staged_path(part, "forgetting")
    import shutil

    os.makedirs(os.path.dirname(staged), exist_ok=True)
    shutil.move(part, staged)
    open(os.path.join(staged, "_SUCCESS"), "w").close()

    assert main(["recover", "--warehouse", wh.root]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["completed"] == [part]
    assert wh.read_partition(spark, "raw", "ndt", "ndt7", day).count() == 1

    # a torn orphan (no _SUCCESS) is vacuumable once idle
    orphan = _staged_path(part, "compacting")
    os.makedirs(orphan, exist_ok=True)
    assert main(["vacuum", "--warehouse", wh.root, "--min-age", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["removed"] == [orphan]
    assert not os.path.exists(orphan)
