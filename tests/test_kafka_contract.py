"""Plan-contract tests for the Kafka source/sink wiring (S1/S2/S6).

No broker (and no spark-sql-kafka connector jar) exists in this rig, so
these pin everything short of the socket: the exact option sets the
readStream/writeStream plans carry, the producer's (key, value) message
projection round-tripping through the consumer's decoder, and — when the
connector is absent — that the failure happens at data-source resolution
with a clear error, not silently.  Reference consumers/producers:
streaming/simple/stream_processor.py:89-95, streaming/flink/
feature_job.py:448-471, generators/txgen.py:329-331.
"""

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streaming_feature_store_spark.sources.kafka import (
    decode_json,
    kafka_message_frame,
    kafka_sink_options,
    kafka_source_options,
    read_kafka_stream,
)


def test_source_options_contract():
    """The consumer plan carries exactly the reference's knobs: broker
    list, multi-topic subscribe, startingOffsets, and the
    maxOffsetsPerTrigger backpressure limit (stringified, as the
    DataSource option API requires)."""
    opts = kafka_source_options(
        "b1:9092,b2:9092",
        "txn.events,card.events",
        starting_offsets="earliest",
        max_offsets_per_trigger=50_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "txn.events,card.events",
        "startingOffsets": "earliest",
        "maxOffsetsPerTrigger": "50000",
    }
    # backpressure knob is strictly opt-in — absent means broker-paced
    assert "maxOffsetsPerTrigger" not in kafka_source_options(
        "b1:9092", "t"
    )
    assert kafka_source_options("b1:9092", "t")["startingOffsets"] == (
        "latest"
    )


def test_sink_options_contract():
    assert kafka_sink_options("b1:9092", "features.out", "/ckpt/x") == {
        "kafka.bootstrap.servers": "b1:9092",
        "topic": "features.out",
        "checkpointLocation": "/ckpt/x",
    }


def test_message_frame_round_trips_through_decoder(spark):
    """Producer projection contract: key is the entity id as a string
    (per-key partition ordering), value is the full row as JSON that the
    S5 consumer decoder recovers losslessly."""
    df = spark.createDataFrame(
        [(7, "purchase", 12.5), (8, "view", None)],
        StructType(
            [
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("amount", DoubleType()),
            ]
        ),
    )
    msg = kafka_message_frame(df, "user_id")
    assert [f.name for f in msg.schema.fields] == ["key", "value"]
    assert all(f.dataType == StringType() for f in msg.schema.fields)

    back = decode_json(msg, df.schema)
    got = {
        (r["user_id"], r["event_type"], r["amount"], r["_corrupt"])
        for r in back.collect()
    }
    assert got == {(7, "purchase", 12.5, None), (8, "view", None, None)}
    assert {r["key"] for r in msg.collect()} == {"7", "8"}


def test_read_kafka_stream_builds_or_fails_at_resolution(spark):
    """With the connector jar present the constructed source must be a
    streaming DataFrame; without it, the failure must be the clear
    data-source-resolution error naming kafka (i.e., option wiring and
    format selection executed — nothing upstream of the classpath lookup
    is broken)."""
    try:
        df = read_kafka_stream(
            spark, "localhost:9092", "t1", max_offsets_per_trigger=10
        )
    except Exception as e:  # connector absent in this rig
        msg = str(e).lower()
        assert "kafka" in msg and (
            "failed to find" in msg or "data source" in msg
        )
    else:  # pragma: no cover - connector present
        assert df.isStreaming
        assert "value" in df.columns


def test_write_kafka_plan_construction(spark, tmp_path):
    """The producer start() must fail at data-source resolution (jar
    absent) or start a streaming query (jar present, broker reachable is
    NOT required to construct the plan) — never at the projection or
    option-wiring layer."""
    from streaming_feature_store_spark.sources.kafka import write_kafka

    df = spark.createDataFrame([(1, "a")], "user_id long, event_type string")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    try:
        q = write_kafka(
            stream.select(
                F.col("value").alias("user_id"),
                F.lit("x").alias("event_type"),
            ),
            "localhost:9092",
            "out",
            "user_id",
            str(tmp_path / "ckpt"),
        )
    except Exception as e:
        msg = str(e).lower()
        assert "kafka" in msg and (
            "failed to find" in msg or "data source" in msg
        )
    else:  # pragma: no cover - connector present
        q.stop()
    # the projection layer itself is exercised in batch regardless
    assert kafka_message_frame(df, "user_id").count() == 1
