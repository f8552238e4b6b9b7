"""Streaming corpus ingestion: scrub + split on the way in.

The map-only front of the training-data pipeline (PII redaction,
deterministic split assignment) belongs at INGESTION time — applied once
as documents arrive, not re-run over the corpus later. Both operators
are pure narrow column expressions (functions/scrub.py,
operators/sampling.hash_split), so they attach to a readStream exactly
as to a batch frame, and the NATIVE parquet file sink gives exactly-once
delivery (per-batch file manifest in the checkpoint — no foreachBatch
needed for a map-only stream; compare streaming/sink.py, which needs
foreachBatch only because its rollup must OVERWRITE day partitions).

At scale: zero state stores, zero shuffles — each micro-batch is a
partition-local scan→project→write; the `split=` partitioning on the
output directory means downstream trainers prune to their split at the
source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_gardener_spark.functions import scrub as SC
from etl_gardener_spark.operators.sampling import hash_split

_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over ``<sf_dir>/documents.parquet`` (directory source +
    glob filter, same pattern as events.read_events_stream)."""
    return (
        spark.readStream.schema(_DOCS_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "documents.parquet")
        .load(sf_dir)
    )


def scrub_split_transform(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """The ingestion projection: redact PII (counts preserved as columns),
    assign the deterministic split. Works identically on a stream or a
    batch frame — the batch application IS the oracle for the streamed
    one."""
    weights = weights or {"train": 0.96, "val": 0.02, "test": 0.02}
    scrubbed = docs.select(
        id_col,
        SC.redact(text_col).alias(text_col),
        *SC.pii_counts(text_col),
    )
    return hash_split(scrubbed, id_col, weights)


def scrub_split_to_parquet(docs: DataFrame, path: str, checkpoint: str):
    """Start the ingestion stream into a ``split=``-partitioned parquet
    directory via the native file sink (exactly-once: committed files are
    recorded in the sink manifest; a replayed micro-batch is skipped)."""
    cleaned = scrub_split_transform(docs)
    return (
        cleaned.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("split")
        .outputMode("append")
        .start()
    )


def jsonl_ingest_with_dlq(
    spark: SparkSession,
    landing_dir: str,
    schema: T.StructType,
    good_path: str,
    dlq_path: str,
    checkpoint: str,
):
    """Streaming JSONL ingestion with a dead-letter queue: parsed rows
    land under ``good_path``, malformed lines land as raw text under
    ``dlq_path`` — nothing is silently dropped (the streaming face of
    sources/jsonl.py's PERMISSIVE corrupt-record policy).

    Both sinks are written from ``foreachBatch`` into per-batch
    subdirectories (``batch=<id>``) with overwrite mode: a replayed
    micro-batch rewrites ITS OWN directory, so delivery is exactly-once
    without relying on the file-sink manifest (which cannot split one
    stream across two sinks). Readers just read the directory tree.
    """
    corrupt = "_corrupt_record"
    read_schema = T.StructType(
        list(schema.fields) + [T.StructField(corrupt, T.StringType())]
    )
    raw = (
        spark.readStream.schema(read_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .json(landing_dir)
    )

    def _route(batch_df, batch_id: int) -> None:
        batch_df.persist()
        try:
            bad = batch_df.filter(F.col(corrupt).isNotNull()).select(
                F.col(corrupt).alias("raw_line")
            )
            good = batch_df.filter(F.col(corrupt).isNull()).drop(corrupt)
            good.write.mode("overwrite").parquet(f"{good_path}/batch={batch_id}")
            if bad.limit(1).count() > 0:
                bad.write.mode("overwrite").parquet(
                    f"{dlq_path}/batch={batch_id}"
                )
        finally:
            batch_df.unpersist()

    return (
        raw.writeStream.foreachBatch(_route)
        .option("checkpointLocation", checkpoint)
        .start()
    )
