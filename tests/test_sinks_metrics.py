"""Retention/TTL delete (T10), streaming metrics listener (T9), P12 string
re-typing, and M16 in-pipeline scoring (model applied inside foreachBatch —
no HTTP hop, unlike the reference's stream_processor.py:222-246)."""

import datetime as dt
import os

import pyspark.sql.functions as F

from streaming_feature_store_spark.functions.exprs import coerce_typed_strings
from streaming_feature_store_spark.streaming.sinks import (
    delta_available,
    retention_delete,
    retention_drop_partitions,
    upsert_latest,
)
from streaming_feature_store_spark.streaming.watermarks import MetricsListener

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


import pytest


@pytest.mark.parametrize("backend", ["parquet", "delta"])
def test_upsert_latest_backends(spark, tmp_path, backend):
    """S7 latest-view MERGE semantics hold under both physical backends:
    newest-ts wins, untouched keys survive, re-applying a batch is a no-op
    (idempotency). The delta case exercises a real MERGE INTO where
    delta-spark is installed and skips cleanly elsewhere (this rig lacks
    the jars — same environmental gate as Avro)."""
    if backend == "delta" and not delta_available(spark):
        pytest.skip("delta-spark not available in this rig")
    path = str(tmp_path / f"latest_{backend}")
    read_fmt = (lambda: spark.read.format("delta").load(path)) if backend == "delta" \
        else (lambda: spark.read.parquet(path))

    b1 = spark.createDataFrame(
        [(1, 100, 10.0), (2, 100, 20.0), (3, 100, 30.0)],
        "user_id long, window_start_s long, score double",
    )
    upsert_latest(spark, b1, path, ["user_id"], "window_start_s", backend=backend)
    b2 = spark.createDataFrame(
        [(2, 200, 21.0), (3, 50, 99.0)],  # 2 newer (wins), 3 older (loses)
        "user_id long, window_start_s long, score double",
    )
    upsert_latest(spark, b2, path, ["user_id"], "window_start_s", backend=backend)

    def snap():
        return {
            r["user_id"]: (r["window_start_s"], r["score"])
            for r in read_fmt().collect()
        }

    got = snap()
    assert got[1] == (100, 10.0)   # untouched by batch 2
    assert got[2] == (200, 21.0)   # newer incoming won
    assert got[3] == (100, 30.0)   # older incoming lost
    upsert_latest(spark, b2, path, ["user_id"], "window_start_s", backend=backend)
    assert snap() == got           # idempotent re-apply


def test_retention_delete(spark, tmp_path):
    path = str(tmp_path / "log")
    now_s = 1_000_000
    spark.createDataFrame(
        [(1, now_s - 100), (2, now_s - 90_000), (3, now_s - 86_401)],
        "user_id long, window_start_s long",
    ).write.parquet(path)
    retention_delete(spark, path, "window_start_s", horizon_s=86_400, now_s=now_s)
    kept = sorted(r["user_id"] for r in spark.read.parquet(path).collect())
    assert kept == [1]  # 24h TTL: only the fresh row survives


def test_retention_delete_preserves_partition_layout(spark, tmp_path):
    """The TTL rewrite must keep the table's hive partition directories, or
    later dynamic-partition-overwrite merges lose their replace-only-touched
    invariants over the pre-retention rows."""
    path = str(tmp_path / "latest")
    now_s = 1_000_000
    spark.createDataFrame(
        [(1, now_s - 100, 3), (2, now_s - 200, 7), (3, now_s - 90_000, 3)],
        "user_id long, window_start_s long, _bucket int",
    ).write.partitionBy("_bucket").parquet(path)
    retention_delete(spark, path, "window_start_s", horizon_s=86_400, now_s=now_s)
    part_dirs = sorted(
        d for d in os.listdir(path) if d.startswith("_bucket=")
    )
    assert part_dirs == ["_bucket=3", "_bucket=7"], part_dirs
    kept = sorted(r["user_id"] for r in spark.read.parquet(path).collect())
    assert kept == [1, 2]


def test_retention_drop_partitions(spark, tmp_path):
    path = str(tmp_path / "log")
    spark.createDataFrame(
        [(1, dt.date(2024, 1, 1)), (2, dt.date(2024, 1, 10)), (3, dt.date(2024, 1, 20))],
        "user_id long, _date date",
    ).write.partitionBy("_date").parquet(path)
    now_s = int(dt.datetime(2024, 1, 21).timestamp())
    dropped = retention_drop_partitions(path, horizon_s=5 * 86_400, now_s=now_s)
    assert sorted(dropped) == ["_date=2024-01-01", "_date=2024-01-10"]
    kept = sorted(r["user_id"] for r in spark.read.parquet(path).collect())
    assert kept == [3]  # whole-partition drop, no rewrite of survivors


def test_coerce_typed_strings(spark):
    df = spark.createDataFrame(
        [("1.5", "7", "True", "oops"), ("bad", "x", "false", "2")],
        "a string, b string, c string, d string",
    )
    out = coerce_typed_strings(
        df, {"a": "double", "b": "bigint", "c": "boolean", "d": "int"}
    ).collect()
    rows = {tuple(r) for r in out}
    assert (1.5, 7, True, None) in rows   # 'oops' → null, not an error
    assert (None, None, False, 2) in rows  # bad numerics → null


def test_metrics_listener_captures_progress(spark, tmp_path):
    from streaming_feature_store_spark.streaming.pipeline import (
        read_file_stream,
        start_feature_pipeline,
    )
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, BASE, 1.0), (2, BASE + dt.timedelta(seconds=5), 2.0)], schema
    ).write.mode("append").parquet(src)

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = read_file_stream(spark, src, schema)
        q = start_feature_pipeline(
            spark,
            stream,
            str(tmp_path / "latest"),
            str(tmp_path / "log"),
            checkpoint=str(tmp_path / "ckpt"),
        )
        q.awaitTermination(120)
    finally:
        spark.streams.removeListener(listener)
    assert listener.progress, "listener saw no progress events"
    total_in = sum(p["numInputRows"] for p in listener.progress)
    assert total_in == 2
    assert any(p["watermark"] is not None for p in listener.progress)


def test_score_inside_foreach_batch(spark, tmp_path):
    """M16: model inference inside the streaming sink — scores land next to
    features in the latest view, no external scoring service."""
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampType,
    )
    from streaming_feature_store_spark.ml.training import (
        TrainConfig, build_pipeline, score,
    )
    from streaming_feature_store_spark.streaming.pipeline import read_file_stream

    # tiny model on synthetic features
    train = spark.range(500).select(
        (F.rand(1) * 10).alias("value_sum"),
        (F.col("id") % 5 + 1).cast("double").alias("event_count"),
    ).withColumn("label", (F.col("value_sum") > 5).cast("int"))
    model = build_pipeline(
        TrainConfig(feature_cols=["value_sum", "event_count"], algorithm="lr")
    ).fit(train)

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, BASE, 9.0), (2, BASE + dt.timedelta(seconds=3), 1.0)], schema
    ).write.mode("append").parquet(src)

    out_path = str(tmp_path / "scored")

    def scoring_sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        scored = score(
            model, batch_df.withColumn("event_count", F.col("event_count").cast("double"))
        )
        scored.select("user_id", "window_start_s", "score").write.mode(
            "append"
        ).parquet(out_path)

    from streaming_feature_store_spark.streaming.pipeline import windowed_features

    feats = windowed_features(read_file_stream(spark, src, schema))
    q = (
        feats.writeStream.outputMode("update")
        .foreachBatch(scoring_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out_path)
    assert rows.count() > 0
    assert rows.filter((F.col("score") < 0) | (F.col("score") > 1)).count() == 0


def test_with_observation_rides_along(spark):
    """observe() metrics must be collected by the SAME job that runs the
    query (no second scan) and report aggregate values for exactly the
    rows that flowed through."""
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.sources.file import load_table
    from streaming_feature_store_spark.streaming.watermarks import (
        with_observation,
    )

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    observed, obs = with_observation(
        ev.filter(F.col("event_type") == "purchase"),
        "purchase_audit",
        {
            "n_rows": F.count(F.lit(1)),
            "value_sum": F.sum("value"),
            "null_values": F.sum(F.col("value").isNull().cast("long")),
        },
    )
    n_out = observed.count()  # the one and only action
    got = obs.get
    assert got["n_rows"] == n_out > 0
    expected_sum = (
        ev.filter(F.col("event_type") == "purchase").agg(F.sum("value")).first()[0]
    )
    assert abs(got["value_sum"] - expected_sum) < 1e-6
    assert got["null_values"] == 0


def test_quality_monitor_streams_rule_counters(spark, tmp_path):
    """quality_monitor counters must arrive per micro-batch through
    MetricsListener.observedMetrics and sum to the batch-side truth."""
    import time

    import pyspark.sql.functions as F

    from streaming_feature_store_spark.streaming.pipeline import (
        read_file_stream,
    )
    from streaming_feature_store_spark.streaming.watermarks import (
        MetricsListener,
        quality_monitor,
    )
    from tests.test_streaming import BASE, SCHEMA, _write_batch
    import datetime as dt

    src = str(tmp_path / "src")
    rows = [
        (1, 7, BASE + dt.timedelta(seconds=1), 50.0, "view"),
        (2, 7, BASE + dt.timedelta(seconds=2), -1.0, "view"),
        (3, 8, BASE + dt.timedelta(seconds=3), 250.0, "purchase"),
        (4, 8, BASE + dt.timedelta(seconds=4), 5.0, None),
    ]
    _write_batch(spark, src, rows)

    listener = MetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = read_file_stream(spark, src, SCHEMA)
        monitored = quality_monitor(
            stream,
            {
                "negative_value": F.col("value") < 0,
                "value_above_200": F.col("value") > 200,
                "null_event_type": F.col("event_type").isNull(),
            },
        )
        q = (
            monitored.writeStream.outputMode("append")
            .format("noop")
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        # listener delivery is async; progress events can trail stop()
        deadline = time.time() + 30
        totals = {}
        while time.time() < deadline:
            totals = {}
            for p in listener.progress:
                for k, v in (
                    p.get("observedMetrics", {}).get("quality") or {}
                ).items():
                    totals[k] = totals.get(k, 0) + v
            if totals.get("n_rows", 0) >= len(rows):
                break
            time.sleep(0.5)
        assert totals.get("n_rows") == 4
        assert totals.get("negative_value") == 1
        assert totals.get("value_above_200") == 1
        assert totals.get("null_event_type") == 1
    finally:
        spark.streams.removeListener(listener)
