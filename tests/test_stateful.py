"""Per-event stateful emission (applyInPandasWithState): exact reference
cadence — one output row per event, trailing-window stats ending at the
event, two-tier lateness (late-accepted within 60 s, dropped beyond),
state carried across micro-batches via the checkpoint."""

import datetime as dt
import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from streaming_feature_store_spark.streaming.stateful import per_event_features

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    feats = per_event_features(stream, window_s=300, allowed_lateness_s=60)
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


def test_per_event_emission_and_lateness(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    # batch 1: trio inside one window (FIXTURES §4.1 shape)
    write(
        [
            (7, BASE + dt.timedelta(seconds=1), 50.0),
            (7, BASE + dt.timedelta(seconds=2), 150.0),
            (7, BASE + dt.timedelta(seconds=3), 25.0),
        ]
    )
    res = {r["event_us"]: r for r in _run(spark, src, out, ckpt).collect()}
    assert len(res) == 3  # per-EVENT emission, not per-window
    us3 = int((BASE + dt.timedelta(seconds=3)).timestamp() * 1_000_000)
    assert res[us3]["event_count"] == 3
    assert res[us3]["value_sum"] == 225.0 and res[us3]["value_avg"] == 75.0
    assert res[us3]["value_max"] == 150.0 and res[us3]["value_min"] == 25.0

    # batch 2 (state carried via checkpoint): an event 6 min later must see a
    # fresh window. Within a micro-batch events process in event-time order,
    # so lateness is judged against state from PRIOR batches.
    write([(7, BASE + dt.timedelta(minutes=6), 10.0)])
    res2 = {r["event_us"]: r for r in _run(spark, src, out, ckpt).collect()}
    us6 = int((BASE + dt.timedelta(minutes=6)).timestamp() * 1_000_000)
    assert res2[us6]["event_count"] == 1          # old window evicted
    assert res2[us6]["late_accepted"] is False

    # batch 3: a 30 s-late event (vs max seen = 6 min) is ACCEPTED + flagged
    # and joins the 6-min event's window; a 3-min-late event is DROPPED
    write(
        [
            (7, BASE + dt.timedelta(minutes=6, seconds=-30), 20.0),   # late, within 60 s
            (7, BASE + dt.timedelta(minutes=3), 99.0),                # late beyond 60 s
        ]
    )
    res3 = {r["event_us"]: r for r in _run(spark, src, out, ckpt).collect()}
    assert len(res3) == 5  # 3 + 1 + 1 accepted (the 3-min event dropped)
    us_late = int((BASE + dt.timedelta(minutes=6, seconds=-30)).timestamp() * 1_000_000)
    assert res3[us_late]["late_accepted"] is True
    assert res3[us_late]["event_count"] == 2      # merged into the live window
    assert all(
        r["event_us"] != int((BASE + dt.timedelta(minutes=3)).timestamp() * 1e6)
        for r in res3.values()
    )
