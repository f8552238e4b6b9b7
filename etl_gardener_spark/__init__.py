"""etl_gardener_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of m-lab/etl-gardener, re-expressed Spark-first.

The reference (https://github.com/m-lab/etl-gardener) is an orchestration
control plane driving a fixed relational pipeline on BigQuery:

    Parsing -> postProcessing -> Loading -> Deduplicating -> Copying
            -> Deleting -> Joining -> Complete

This package re-creates both layers on Apache Spark:

* ``warehouse`` / ``operators`` / ``sources`` — the relational layer: JSONL
  load, windowed dedup-keep-best, daily-partition copy / truncate / delete,
  and left-join annotation materialization (reference cloud/bq/ops.go,
  cloud/bq/dedup.go), all as declarative DataFrame programs that Catalyst
  optimizes (partition pruning, predicate pushdown, broadcast joins, AQE).
* ``orchestrator`` — the dataflow layer: date iterators, the persistent job
  tracker state machine, the polling monitor with Actions, and the Jobs API
  surface (reference tracker/, job-service/, ops/).
* ``functions`` / ``operators`` extensions — LLM-data-pipeline operators
  (exact + MinHash/SimHash/Jaccard/embedding dedup, ANN similarity search,
  text analysis, multimodal column plumbing) designed partition-parallel for
  100 TB scale.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
