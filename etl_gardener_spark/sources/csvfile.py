"""CSV source/sink — a landing format the reference itself never uses
(BigQuery loads are JSON-only, cloud/bq/ops.go:139), provided as an
extension so pipelines whose parsers emit delimited text can land through
the same T1 path.

Same contract as ``sources/jsonl.py``: explicit schema (never
``inferSchema`` — inference is an extra full pass over the landing
prefix), PERMISSIVE parse with malformed rows either dropped or counted,
microsecond-pinned timestamps so the round-trip is lossless. CSV is
line-splittable like JSONL, so a day prefix scans with full parallelism
and parsing stays JVM-side (Univocity) inside codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# Microsecond precision, same rationale as jsonl.TIMESTAMP_FORMAT.
TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

# Quote-doubling ("" inside a quoted field) rather than backslash escape:
# the doubled form is what RFC 4180 readers (DuckDB, BigQuery, pandas)
# produce and accept, so landed files are interchange-safe.
_OPTS = {
    "header": "true",
    "timestampFormat": TIMESTAMP_FORMAT,
    "quote": '"',
    "escape": '"',
}


def write_csv(df: DataFrame, path: str) -> None:
    """Write ``df`` as headered CSV under ``path`` (one file per task)."""
    w = df.write.mode("overwrite")
    for k, v in _OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Read CSV under ``path`` with an explicit schema.

    ``drop_corrupt=True`` drops malformed lines at parse time
    (DROPMALFORMED); otherwise they populate ``_corrupt_record``
    (PERMISSIVE) for load-stat counting, mirroring the reference's
    tolerated-load-warning path (ops/actions.go:215-225).
    """
    reader = spark.read
    for k, v in _OPTS.items():
        reader = reader.option(k, v)
    if drop_corrupt:
        return reader.schema(schema).option("mode", "DROPMALFORMED").csv(path)
    read_schema = schema
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        reader.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
