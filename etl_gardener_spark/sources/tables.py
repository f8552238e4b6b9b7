"""Loader for the driver's synthetic parquet tables (TESTDATA.md).

The testdata parquet files carry INT64 TIMESTAMP(NANOS) columns, which
Spark's vectorized parquet reader rejects outright (PARQUET_TYPE_ILLEGAL) —
Spark timestamps are microsecond-precision. We read nanos as raw INT64
(``spark.sql.legacy.parquet.nanosAsLong``) and convert with integer division
(``ns DIV 1000`` — integer math, not float, to keep microsecond exactness at
1e18-nanosecond magnitudes), which is bit-identical to how DuckDB truncates
nanos to its microsecond timestamps — so oracle comparisons line up exactly.

Nanos columns are detected from parquet file metadata via pyarrow — a
driver-side, metadata-only read (no data scanned), so it costs nothing at
100 TB: one footer read per table, not per file, since a table's schema is
uniform.
"""

from __future__ import annotations

import os
from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


@lru_cache(maxsize=256)
def _nanos_columns(key: tuple[str, int, int]) -> tuple[str, ...]:
    """Nanos-typed column names for the parquet at ``key[0]``; the key
    carries the same (mtime_ns, size) fingerprint as _SCHEMA_CACHE so a
    rewritten file re-reads its footer."""
    import pyarrow.parquet as pq
    import pyarrow.types as pat

    schema = pq.read_schema(key[0])
    return tuple(
        name
        for name, typ in zip(schema.names, schema.types)
        if pat.is_timestamp(typ) and typ.unit == "ns"
    )


# (path, mtime_ns, size) -> Spark's own inferred schema JSON, memoized per
# driver process. METADATA only (the catalog/manifest role a warehouse
# table format plays at 100 TB — guide §6): re-inferring the schema costs
# a driver-side file listing + footer read per spark.read call (~90 ms),
# paid by every query build; the data itself is always re-read. The key
# carries a cheap file fingerprint (one os.stat, ~µs) so a parquet
# REWRITTEN at the same path with a different schema re-infers instead of
# silently applying the stale schema (r11 advisor).
_SCHEMA_CACHE: dict[tuple[str, int, int], str] = {}


def _schema_key(path: str) -> tuple[str, int, int]:
    try:
        st = os.stat(path)
        return (path, st.st_mtime_ns, st.st_size)
    except OSError:
        return (path, -1, -1)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read ``<sf_dir>/<name>.parquet`` with nanos timestamps normalized to
    Spark TimestampType (microseconds, truncating — DuckDB-identical)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = _schema_key(path)
    nanos = _nanos_columns(key)
    if nanos and spark.conf.get(_NANOS_CONF, "false") != "true":
        spark.conf.set(_NANOS_CONF, "true")
    cached = _SCHEMA_CACHE.get(key)
    if cached is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema.json()
    else:
        from pyspark.sql.types import StructType

        import json as _json

        df = spark.read.schema(
            StructType.fromJson(_json.loads(cached))
        ).parquet(path)
    for c in nanos:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # If the session still inferred TIMESTAMP_NTZ (tz-naive parquet micros),
    # normalize to the session-TZ TimestampType: with the engine's pinned UTC
    # session zone this is value-identical to the oracle's naive timestamps,
    # and keeps epoch casts (`CAST(ts AS LONG)`) legal.
    from pyspark.sql import types as T

    if any(isinstance(f.dataType, T.TimestampNTZType) for f in df.schema.fields):
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise RuntimeError(
                f"load_table requires a UTC session timezone to cast "
                f"TIMESTAMP_NTZ losslessly; session has {tz!r}. Build the "
                "session with etl_gardener_spark.session.get_spark."
            )
        for f in df.schema.fields:
            if isinstance(f.dataType, T.TimestampNTZType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
