"""Single-slice local relations.

``spark.createDataFrame(<python list>)`` parallelizes the rows across
``defaultParallelism`` pickled slices (32 on the bench box), so every
scan of the relation — a broadcast build, a noop write, a join probe —
launches 32 tasks that each pay a Python-worker round-trip (~130 ms of
executorRunTime for ~3 ms of CPU). Profiled at sf0.1, three such
broadcast builds accounted for 13.5 of `emb_pq_recall_report`'s 14.2
task-seconds. ``.coalesce(1)`` does NOT fix it — it chains the 32
parent evals into ONE task that performs 32 sequential worker
round-trips (~3.6 s measured).

``local_df`` therefore parallelizes the rows into a SINGLE slice
before applying the schema: one Python eval (~0.1 s) per scan, with
row-conversion semantics identical to ``createDataFrame(list)`` (None
stays NULL, NaN stays NaN — an Arrow/pandas path would be zero-task
but silently folds float NaN into NULL, which the differential oracles
can see).

This is scale-correct, not a small-SF hack: these relations are
O(k)/O(model) rows by construction (the same bound that justifies
collecting them driver-side), and a 1-slice scan is exactly how a
broadcast build side should look regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` as a single-slice
    relation — use for every driver-local row list that feeds a plan."""
    if not isinstance(rows, list):
        rows = list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )
