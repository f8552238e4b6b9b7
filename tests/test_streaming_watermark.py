"""Late-data semantics: the event-time watermark must drop rows arriving
after their window is sealed — proven with a file source fed
incrementally between processAllAvailable() drains (each new file is one
micro-batch, the closest local-mode analogue to a live stream)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        str(path)
    )


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    # batch 1: two rows in the 10:00 window, plus a 12:05 row that drives
    # the watermark to 11:55 (> the 10:00 window's end) at batch end
    _write(
        spark,
        src,
        [
            (1, datetime(2024, 1, 1, 10, 0), 1.0),
            (2, datetime(2024, 1, 1, 10, 30), 1.0),
            (3, datetime(2024, 1, 1, 12, 5), 1.0),
        ],
    )
    events = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_test")
        .start()
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE row for the already-sealed 10:00 window (must be
        # dropped) and an on-time 12:10 row
        _write(
            spark,
            src,
            [
                (4, datetime(2024, 1, 1, 10, 15), 1.0),
                (5, datetime(2024, 1, 1, 12, 10), 1.0),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = {
        r["win"]["start"]: r["n"] for r in spark.table("wm_test").collect()
    }
    # the 10:00 window was emitted once the watermark passed 11:00, with
    # ONLY the two on-time rows — the late 10:15 row did not resurrect or
    # amend it
    assert out[datetime(2024, 1, 1, 10, 0)] == 2
    # the 12:00 window is still open (watermark has not passed 13:00), so
    # append mode has not emitted it
    assert datetime(2024, 1, 1, 12, 0) not in out
    spark.sql("DROP TABLE IF EXISTS wm_test")
