"""Bucketed co-located joins: writing both fact tables bucketed by the join
key lets Spark join them with ZERO exchanges — the 100 TB strategy for
repeated entity-keyed joins (feature log ⋈ labels every training run)."""

import pyspark.sql.functions as F


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10_000).select(
            (F.col("id") % 500).alias("k"), F.col("id").alias("va")
        )
        b = spark.range(10_000).select(
            (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("vb")
        )
        a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_a")
        b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bk_b")
        j = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle at all
        assert j.count() == 10_000 * 20
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")
