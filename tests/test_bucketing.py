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


def test_sorted_write_tightens_rowgroup_stats(spark, tmp_path):
    """sort_by clustering makes parquet row-group min/max selective:
    a point filter on the sort key overlaps (almost) only its own row
    group, while the unsorted layout forces every group to be read."""
    import pyarrow.parquet as pq
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.sources.file import write_files

    df = (
        spark.range(200_000)
        .select(
            (F.abs(F.xxhash64("id")) % 1000).alias("user_id"),
            F.col("id").alias("event_id"),
        )
        .repartition(2)
    )
    opts = {"parquet.block.size": 64 * 1024}  # force many small row groups

    def overlap_fraction(path):
        files = [str(p) for p in __import__("pathlib").Path(path).glob("*.parquet")]
        total, hit = 0, 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index("user_id")
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                total += 1
                if st.min <= 500 <= st.max:
                    hit += 1
        assert total > 20  # the block-size option did produce many groups
        return hit / total

    write_files(df, str(tmp_path / "unsorted"), **opts)
    write_files(df, str(tmp_path / "sorted"), sort_by=("user_id",), **opts)
    f_unsorted = overlap_fraction(tmp_path / "unsorted")
    f_sorted = overlap_fraction(tmp_path / "sorted")
    assert f_unsorted == 1.0  # hash-scattered: every group spans the key
    assert f_sorted < 0.2  # clustered: the point key lives in few groups
