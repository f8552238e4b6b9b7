"""Plan string extraction — the Spark analogue of BigQuery dry-run.

The reference validates queries without executing them via BigQuery's
``dryRun`` flag (cloud/bq/ops.go:105-127) and its integration tests assert
on the rendered query (cloud/bq/ops_test.go:38-127). Spark's equivalent is
the analyzed/optimized plan: if analysis succeeds, the query is valid
against the current schemas; the formatted physical plan additionally shows
pushed filters, scan schemas, and join strategies — which our tests assert
on (pushdown happened, the join broadcast, codegen covers the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` as a string (modes: simple, extended,
    codegen, cost, formatted)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-initial) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()
