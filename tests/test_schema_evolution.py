"""Schema evolution parity (ALLOW_FIELD_ADDITION / ALLOW_FIELD_RELAXATION,
cloud/bq/ops.go:280-282): day partitions written with evolving schemas
reconcile on read with merge_schema — added fields are NULL on old days."""

from __future__ import annotations

from datetime import date as Date

from pyspark.sql import functions as F

from etl_gardener_spark.warehouse import Warehouse


def test_field_addition_across_days(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    day1 = spark.createDataFrame(
        [(1, "a")], ["id", "payload"]
    ).withColumn("date", F.lit("2024-03-01").cast("date"))
    wh.append(day1, "raw", "exp", "dt")
    # day 2 adds a column (parser emitted a new field)
    day2 = spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "payload", "new_metric"]
    ).withColumn("date", F.lit("2024-03-02").cast("date"))
    wh.append(day2, "raw", "exp", "dt")

    merged = wh.read(spark, "raw", "exp", "dt", merge_schema=True)
    assert "new_metric" in merged.columns
    rows = {r.id: r.new_metric for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}  # old day relaxed to NULL

    # partition pruning still applies on the merged read
    one = wh.read_partition(spark, "raw", "exp", "dt", Date(2024, 3, 2))
    assert one.count() == 1
