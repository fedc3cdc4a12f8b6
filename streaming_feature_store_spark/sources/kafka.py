"""Kafka source/sink wiring (S1/S2/S6) + payload codecs (S3-S5).

No broker exists in the test environment, so everything here is import-safe
and separates *plan construction* (testable) from *connection*:

- ``read_kafka_stream`` builds the readStream plan the reference's consumers
  correspond to (stream_processor.py:89-95; feature_job.py:448-471):
  subscribe N topics, startingOffsets, maxOffsetsPerTrigger as the
  backpressure knob (the rate-limit analog of base_generator.py:207-230).
- ``decode_json`` is the S5 deserialize-validate-DLQ path: from_json with a
  declared schema, corrupt records preserved in ``_corrupt`` for DLQ routing
  (streaming/sinks.route_dlq).
- ``decode_avro``/``encode_avro`` gate on the spark-avro package
  (from_avro/to_avro), which is not bundled here; they raise a clear error
  if the package is absent rather than failing at import time.
- ``write_kafka`` produces keyed messages (acks/ordering are broker configs;
  keying by entity id preserves the reference's per-key ordering contract —
  generators/txgen.py:329-331).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType


def kafka_source_options(
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """The consumer plan contract as a plain dict — the exact options the
    readStream plan carries (subscribe list, startingOffsets, the
    maxOffsetsPerTrigger backpressure knob).  Factored out of
    ``read_kafka_stream`` so the contract is pinned by a test without a
    broker or the kafka connector jar on the classpath."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(
                brokers, topics, starting_offsets, max_offsets_per_trigger
            )
        )
        .load()
    )


def decode_json(raw: DataFrame, schema: StructType, value_col: str = "value") -> DataFrame:
    """bytes → typed columns, with malformed payloads kept (not dropped) in
    ``_corrupt`` so the caller can DLQ them (S5/T8). PERMISSIVE mode is the
    distributed analog of the reference's count-and-continue
    (feature_job.py:96-105)."""
    from pyspark.sql.types import StringType as _Str

    # PERMISSIVE from_json yields a struct of nulls for garbage rather than a
    # null struct; the reliable malformed signal is the corrupt-record column.
    s = StructType(schema.fields + [StructField("_cr", _Str())])
    parsed = raw.withColumn("_raw", F.col(value_col).cast("string")).withColumn(
        "_parsed",
        F.from_json(
            F.col("_raw"), s, {"columnNameOfCorruptRecord": "_cr", "mode": "PERMISSIVE"}
        ),
    )
    cols = [F.col(f"_parsed.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(*cols, F.col("_parsed._cr").alias("_corrupt"))


def decode_avro(raw: DataFrame, avro_schema_json: str, value_col: str = "value") -> DataFrame:
    """Avro decode (S3) via the spark-avro package; explicit error when the
    package isn't on the classpath."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "spark-avro package required: submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "(or use sources.avro_codec.decode_avro_py, the jar-free "
            "pure-Python datum codec)"
        ) from e
    return raw.select(from_avro(F.col(value_col), avro_schema_json).alias("r")).select("r.*")


def encode_avro(df: DataFrame, avro_schema_json: str) -> DataFrame:
    """Avro encode (S4) for the producer path."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "spark-avro package required: submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "(or use sources.avro_codec.encode_avro_py, the jar-free "
            "pure-Python datum codec)"
        ) from e
    return df.select(to_avro(F.struct(*df.columns), avro_schema_json).alias("value"))


def kafka_sink_options(
    brokers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """The producer plan contract as a plain dict (broker list, topic,
    checkpoint location) — testable without a broker, same split as
    ``kafka_source_options``."""
    return {
        "kafka.bootstrap.servers": brokers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def kafka_message_frame(df: DataFrame, key_col: str) -> DataFrame:
    """The producer's (key, value) projection: key = entity id as a string
    (per-key partition ordering, the reference's producer contract —
    generators/txgen.py:329-331), value = the full row as JSON.  Pure
    DataFrame transform, so the payload shape is pinned by a batch test
    that round-trips it through ``decode_json``."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns])).alias("value"),
    )


def write_kafka(
    df: DataFrame,
    brokers: str,
    topic: str,
    key_col: str,
    checkpoint: str,
):
    """Keyed producer sink (S6): key by entity id so downstream consumers see
    per-entity ordering, exactly what the reference's partition-by-key
    producers guarantee."""
    return (
        kafka_message_frame(df, key_col)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(brokers, topic, checkpoint))
        .start()
    )
