"""Bucketed co-located joins: the shuffle is paid once at write time;
joins on the bucket key then plan with ZERO hash exchanges (vs two for
the unbucketed equivalent)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_gardener_spark.warehouse import Warehouse


def test_bucketed_join_elides_exchanges(spark, tmp_path):
    wh = Warehouse(str(tmp_path / "wh"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fact = spark.range(20_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("va")
        )
        ann = spark.range(20_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
        )
        ta = wh.save_bucketed(fact, "raw", "exp", "fact", ["k"], 8, ["k"])
        tb = wh.save_bucketed(ann, "raw", "exp", "ann", ["k"], 8, ["k"])

        j = (
            spark.table(ta)
            .join(spark.table(tb), "k")
            .select(F.sum("va").alias("sa"), F.sum("vb").alias("sb"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 0
        row = j.collect()[0]
        assert row.sa == sum(2 * i for i in range(20_000))

        # unbucketed twin shuffles both sides
        fact.write.mode("overwrite").parquet(str(tmp_path / "nb_fact"))
        ann.write.mode("overwrite").parquet(str(tmp_path / "nb_ann"))
        ju = (
            spark.read.parquet(str(tmp_path / "nb_fact"))
            .join(spark.read.parquet(str(tmp_path / "nb_ann")), "k")
            .select(F.sum("va"))
        )
        pu = ju._jdf.queryExecution().executedPlan().toString()
        assert pu.count("Exchange hashpartitioning") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS raw_exp__fact")
        spark.sql("DROP TABLE IF EXISTS raw_exp__ann")


def test_incremental_dedup_band_store_probe_is_colocated(spark, tmp_path):
    """The 100 TB shape of incremental_minhash_dedup: the corpus' LSH
    band-key relation persisted BUCKETED on the probe key means a new
    batch's probe join shuffles only the batch's band rows — the store
    side plans with zero exchanges (one total, vs two unbucketed)."""
    from etl_gardener_spark.operators import neardup as ND

    wh = Warehouse(str(tmp_path / "wh"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        corpus = spark.createDataFrame(
            [(i, f"alpha beta gamma doc number {i} with shared tail tokens")
             for i in range(60)],
            ["doc_id", "text"],
        )
        batch = spark.createDataFrame(
            [(100 + i, f"alpha beta gamma doc number {i} with shared tail tokens")
             for i in range(10)],
            ["doc_id", "text"],
        )
        store_bands = ND.exploded_bands(
            ND.minhash_store(corpus, "text", "doc_id"), "doc_id", 12, 4
        )
        tb = wh.save_bucketed(
            store_bands, "raw", "exp", "bands", ["band", "band_key"], 8, []
        )
        probe = ND.exploded_bands(
            ND.minhash_store(batch, "text", "doc_id"), "doc_id", 12, 4
        ).withColumnRenamed("doc_id", "new_id")
        j = spark.table(tb).join(probe, ["band", "band_key"])
        plan = j._jdf.queryExecution().executedPlan().toString()
        # store side reads its buckets in place; only the batch shuffles
        assert plan.count("Exchange hashpartitioning") == 1
        # the probe finds the batch's exact dups in the store
        assert j.filter(F.col("doc_id") == F.col("new_id") - 100).count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS raw_exp__bands")
