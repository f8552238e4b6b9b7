"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (dedup-feeds-annotation-join, the
reference's core pipeline shape) on sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the LLM-pipeline extensions; definitions live in
``etl_gardener_spark/plans/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_gardener_spark.plans import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return Q.join_annotation_window(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each query (omitted only for
    non-SQL-expressible ops)."""
    return Q.oracle_sql()
