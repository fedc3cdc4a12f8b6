"""transformWithState per-event features (T4 closure): same per-event
emission contract as v1, PLUS idle-key state eviction via event-time
timers — the key's buffer is purged and a tombstone row emitted once the
watermark passes last-activity + idle TTL."""

import datetime as dt
import os

import pytest

# transformWithState's state-server protocol is protobuf-encoded; the rig
# has no protobuf wheel (same class of environmental gate as spark-avro in
# test_avro.py). The module itself imports and plan-builds without it.
pytest.importorskip("google.protobuf")

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streaming_feature_store_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    per_event_features_ttl,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _run(spark, src, out, ckpt):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    feats = per_event_features_ttl(
        stream, window_s=300, allowed_lateness_s=60, idle_ttl_s=600
    )
    q = (
        feats.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


def test_per_event_ttl_eviction(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    # batch 1: key 7 trio inside one window — v1 contract must hold as-is
    write(
        [
            (7, BASE + dt.timedelta(seconds=1), 50.0),
            (7, BASE + dt.timedelta(seconds=2), 150.0),
            (7, BASE + dt.timedelta(seconds=3), 25.0),
        ]
    )
    res = [r for r in _run(spark, src, out, ckpt).collect() if r["event_count"] > 0]
    assert len(res) == 3
    last = max(res, key=lambda r: r["event_us"])
    assert last["event_count"] == 3 and last["value_sum"] == 225.0

    # batch 2: key 8 two hours later pushes the watermark far past key 7's
    # last activity + 600 s TTL → key 7's timer fires, state purged, and a
    # tombstone (event_count = −1) surfaces. A second advance guarantees the
    # timer batch has run regardless of how availableNow slices batches.
    write([(8, BASE + dt.timedelta(hours=2), 10.0)])
    _run(spark, src, out, ckpt)
    write([(8, BASE + dt.timedelta(hours=2, minutes=1), 20.0)])
    res3 = _run(spark, src, out, ckpt).collect()
    tombs = [r for r in res3 if r["event_count"] == -1]
    assert [t["entity_id"] for t in tombs] == ["7"]
    # eviction really cleared the buffer: a fresh key-7 event 2h on sees an
    # empty window (count 1), and is NOT late-dropped (max_us was cleared)
    write([(7, BASE + dt.timedelta(hours=2, minutes=2), 5.0)])
    res4 = {
        (r["entity_id"], r["event_us"]): r
        for r in _run(spark, src, out, ckpt).collect()
        if r["event_count"] > 0
    }
    us = int((BASE + dt.timedelta(hours=2, minutes=2)).timestamp() * 1_000_000)
    assert res4[("7", us)]["event_count"] == 1
