"""Avro codec round-trip (S3/S4): decode_avro ∘ encode_avro ≡ id on the
transaction wire schema (schemas/transactions.v1.avsc; the reference
serializes/deserializes the same record shape in
streaming/core/utils/avro.py:27-98).

The spark-avro connector is an external package
(org.apache.spark:spark-avro_2.13); when the JVM classpath lacks it, the
round-trip test SKIPS cleanly with the submit instructions — it runs
everywhere the package ships."""

import json

import pyspark.sql.functions as F
import pytest

from streaming_feature_store_spark.sources.kafka import decode_avro, encode_avro

# Transaction wire schema (enum relaxed to string for the connector's
# Catalyst mapping; field set mirrors transactions.v1.avsc)
TX_AVRO = json.dumps(
    {
        "type": "record",
        "name": "Transaction",
        "fields": [
            {"name": "txn_id", "type": "string"},
            {"name": "card_id", "type": "string"},
            {"name": "user_id", "type": "string"},
            {"name": "amount", "type": "double"},
            {"name": "currency", "type": "string"},
            {"name": "mcc", "type": "string"},
            {"name": "device_id", "type": "string"},
            {"name": "geo_country", "type": ["null", "string"], "default": None},
            {"name": "timestamp", "type": "long"},
            {"name": "is_fraud", "type": "boolean", "default": False},
        ],
    }
)


def _avro_available(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(
            to_avro(F.struct(F.col("id"))).alias("v")
        ).collect()
        return True
    except Exception:
        return False


def test_avro_round_trip(spark):
    if not _avro_available(spark):
        pytest.skip(
            "spark-avro connector not on the JVM classpath; submit with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version>"
        )
    rows = [
        ("t1", "c1", "u1", 12.5, "USD", "5411", "d1", "US", 1700000000000, False),
        ("t2", "c2", "u2", 990.0, "EUR", "5967", "d2", None, 1700000001000, True),
    ]
    df = spark.createDataFrame(
        rows,
        "txn_id string, card_id string, user_id string, amount double, "
        "currency string, mcc string, device_id string, geo_country string, "
        "timestamp long, is_fraud boolean",
    )
    wire = encode_avro(df, TX_AVRO)
    assert wire.columns == ["value"]
    back = decode_avro(wire, TX_AVRO)
    assert sorted(back.columns) == sorted(df.columns)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}
