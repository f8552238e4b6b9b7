"""Column-level function library for the LLM-data-pipeline extensions.

Everything here returns Spark ``Column`` expressions built exclusively from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd, no Python in
the hot path. Pandas UDFs appear only where built-ins genuinely cannot
express the semantics (see operators/multimodal.py)."""

from etl_gardener_spark.functions import scrub, text

__all__ = ["text", "scrub"]
