"""Shared fixtures: one SparkSession per test run + a DuckDB oracle helper.

The oracle comparison mimics the driver's correctness gate: run the Spark
DataFrame and the equivalent ANSI SQL on DuckDB over the same parquet
tables, then compare row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).
"""

from __future__ import annotations

import hashlib
import math
import os
from datetime import date, datetime

import duckdb
import pytest

from etl_gardener_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl_gardener_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Row-count + column-set + order-insensitive value-hash comparison."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = duck_con.execute(sql)
    d_cols = [d[0] for d in rel.description]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row counts differ: {len(s_rows)} vs {len(d_rows)}"
    sh = value_hash(s_rows, s_cols)
    dh = value_hash(d_rows, d_cols)
    if sh != dh:
        s_set = sorted("\x1f".join(map(_canon, r)) for r in s_rows)[:5]
        d_set = sorted("\x1f".join(map(_canon, r)) for r in d_rows)[:5]
        raise AssertionError(
            f"value hash mismatch\nspark sample: {s_set}\nduck sample: {d_set}"
        )
