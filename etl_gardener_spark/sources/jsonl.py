"""Newline-delimited JSON source — the reference's only input format.

The reference bulk-loads JSONL from object storage into BigQuery
(``gcsRef.SourceFormat = bigquery.JSON``, cloud/bq/ops.go:139) from prefixes
laid out ``<bucket>/<experiment>/<datatype>/YYYY/MM/DD/*`` (tracker/
job.go:100-107, ops/actions.go:145-146). BigQuery's loader tolerates rows
whose fields don't match the managed schema, surfacing "No such field:"
warnings that gardener logs and continues past (ops/actions.go:215-225).

Spark equivalent:

* **Schema-on-read with an explicit schema** — never ``inferSchema`` in
  production: inference is a full extra pass over 100 TB of text. Callers
  pass a ``StructType``; unknown fields in the data are silently ignored
  (BigQuery's tolerated-warning path) and missing fields become NULL
  (ALLOW_FIELD_RELAXATION semantics, cloud/bq/ops.go:280-282).
* **PERMISSIVE mode + ``_corrupt_record``** — malformed lines land in a side
  column instead of failing the load, reproducing log-and-continue. The
  ``LoadStats`` counters mirror what the reference records from BigQuery
  LoadStatistics (InputFiles/OutputRows/bad rows, ops/actions.go:290-309).

Scale notes: JSONL is splittable by line, so a day prefix of N files scans
with full parallelism; ``maxPartitionBytes`` (128 MiB default) bounds task
input. Parsing is JVM-side (Jackson) inside WholeStageCodegen — no Python in
the load path. Gzip-compressed archives (``.jsonl.gz`` — the reference's
landing format) decode transparently via Hadoop codec-by-extension but are
NOT splittable: one task per .gz file, so day parallelism equals file
count — fine for the reference's many-small-archives layout; re-landed
bulk data should prefer plain or zstd-seekable files
(tests/test_table_ops.py::test_load_reads_gzip_jsonl_alongside_plain).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# Spark's JSON default timestamp pattern is millisecond-precision; the
# reference's data carries microsecond event times, so the landing format
# pins microseconds (lossless JSONL round-trip).
TIMESTAMP_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


@dataclass
class LoadStats:
    """Mirrors the load statistics the reference records
    (ops/actions.go:290-309: InputFiles, InputFileBytes, OutputRows,
    bad rows)."""

    input_files: int
    output_rows: int
    corrupt_rows: int
    input_bytes: int = 0


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL under ``path`` with an explicit schema, PERMISSIVE mode.

    Unknown JSON fields are ignored; missing fields are NULL. With
    ``drop_corrupt=True`` (default) malformed lines are dropped at parse
    time (``DROPMALFORMED`` — no side column ever enters the plan, so
    count-only queries stay legal and column pruning is unconstrained).
    With ``drop_corrupt=False`` malformed lines populate only
    ``_corrupt_record`` (PERMISSIVE) so ``read_jsonl_observed`` can count them.
    """
    reader = (
        spark.read.option("timestampFormat", TIMESTAMP_FORMAT)
        # Accept timestamps that don't carry the full microsecond pattern
        # (e.g. "...T01:00:00Z") instead of marking the row corrupt.
        .option("enableDateTimeParsingFallback", "true")
    )
    if drop_corrupt:
        return reader.schema(schema).option("mode", "DROPMALFORMED").json(path)
    read_schema = schema
    if CORRUPT_COL not in [f.name for f in schema.fields]:
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
        )
    return (
        reader.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as newline-delimited JSON (test/fixture helper)."""
    df.write.mode(mode).option("timestampFormat", TIMESTAMP_FORMAT).json(path)


def read_jsonl_observed(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
):
    """Read JSONL for a single downstream WRITE, with row/corrupt counts
    riding that write's own job instead of a separate counting pass.

    Returns ``(good_df, finish)``: ``good_df`` is the corrupt-filtered
    frame to write; after the caller's action has run, ``finish()``
    returns the LoadStats. Implementation: ``df.observe`` attaches
    count/corrupt-count accumulator expressions to the plan — they are
    computed by the tasks of whatever action consumes the frame, so the
    one write job produces data AND statistics. Versus the cache+count
    formulation this removes a full extra pass over the day's batch and
    the cache of it (at 100 TB/day the cache is the difference between a
    streaming-through load and one that spills a day of JSON to
    executor storage).

    One prefix listing total: files/bytes are listed up front and the
    reader receives the EXPLICIT file list, so Spark's file index never
    re-walks the prefix (at ~900k files/day a second recursive listing
    would double the load's metadata I/O). Hidden files (``_``/``.``
    prefixes) are excluded from the read, matching the directory
    reader's convention, but still counted in the listing stats.

    Contract: ``good_df`` must be consumed by exactly ONE action before
    ``finish()`` — the observation binds to the FIRST action that runs
    (a pre-write ``isEmpty()``/``first()`` would capture a partial
    scan's counts), and ``finish()`` blocks until some action has run.
    """
    import os as _os

    from pyspark.sql import Observation

    from etl_gardener_spark.sources.listing import prefix_stats

    paths = [path] if isinstance(path, str) else list(path)
    objs, n_bytes = [], 0
    for pth in paths:
        o, b = prefix_stats(spark, pth)
        objs.extend(o)
        n_bytes += b
    data_files = [
        o.path
        for o in objs
        if not _os.path.basename(o.path).startswith(("_", "."))
    ]
    # empty/missing prefix: fall through to the plain reader so the
    # caller sees the standard path-not-found analysis error
    source = data_files if data_files else path
    raw = read_jsonl(spark, source, schema, drop_corrupt=False)
    obs = Observation()
    observed = raw.observe(
        obs,
        F.count(F.lit(1)).alias("total"),
        F.count(F.col(CORRUPT_COL)).alias("corrupt"),
    )
    good = observed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    def finish() -> LoadStats:
        got = obs.get
        return LoadStats(
            input_files=len(objs),
            output_rows=int(got["total"]) - int(got["corrupt"]),
            corrupt_rows=int(got["corrupt"]),
            input_bytes=n_bytes,
        )

    return good, finish
