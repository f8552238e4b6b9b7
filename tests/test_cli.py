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
