"""Plan inspection utilities (dry-run support, plan assertions in tests)."""

from etl_gardener_spark.plans.explain import explain_str, physical_plan

__all__ = ["explain_str", "physical_plan"]
