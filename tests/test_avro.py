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


# ---------------------------------------------------------------------------
# Pure-Python datum codec (jar-free S3/S4 runtime proof)
# ---------------------------------------------------------------------------


def test_avro_spec_byte_vectors():
    """Known encodings straight from the Avro 1.11 spec's Binary Encoding
    section — proves the wire format, not just self-consistency."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from streaming_feature_store_spark.sources.avro_codec import (
        decode_record,
        encode_record,
    )

    s = StructType(
        [
            StructField("n", LongType(), False),
            StructField("s", StringType(), False),
        ]
    )
    # spec: zigzag varints 0→00, -1→01, 1→02, 2→04, -2→03, 64→80 01;
    # string "foo" → length 3 (06) + bytes
    assert encode_record({"n": 0, "s": "foo"}, s) == bytes.fromhex("00" "06666f6f")
    assert encode_record({"n": -1, "s": ""}, s) == bytes.fromhex("01" "00")
    assert encode_record({"n": 1, "s": ""}, s)[0] == 0x02
    assert encode_record({"n": 64, "s": ""}, s)[:2] == bytes.fromhex("8001")
    assert encode_record({"n": -64, "s": ""}, s)[0] == 0x7F
    # nullable union: branch index precedes the value; null is branch 0
    sn = StructType([StructField("v", LongType(), True)])
    assert encode_record({"v": None}, sn) == bytes.fromhex("00")
    assert encode_record({"v": 3}, sn) == bytes.fromhex("02" "06")
    # decode inverts
    assert decode_record(bytes.fromhex("0206"), sn) == {"v": 3}
    assert decode_record(bytes.fromhex("00"), sn) == {"v": None}


def test_avro_py_roundtrip_distributed(spark):
    """encode_avro_py ∘ decode_avro_py ≡ id over real event rows, executed
    as Arrow-batched kernels in Spark (not driver-side)."""
    from streaming_feature_store_spark.sources.avro_codec import (
        avro_schema_for,
        decode_avro_py,
        encode_avro_py,
    )
    from streaming_feature_store_spark.sources.file import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(200)
    )
    schema = ev.schema
    json_schema = avro_schema_for(schema)
    assert '"null"' in json_schema  # nullable fields mapped to unions

    encoded = encode_avro_py(ev)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    decoded = decode_avro_py(encoded, schema)
    assert decoded.filter(F.col("_corrupt").isNotNull()).count() == 0

    orig = {tuple(r) for r in ev.collect()}
    back = {
        tuple(r)[:-1] for r in decoded.collect()  # drop _corrupt
    }
    assert back == orig and len(orig) > 100


def test_avro_py_corrupt_routes_to_dlq(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    from streaming_feature_store_spark.sources.avro_codec import decode_avro_py

    s = StructType([StructField("n", LongType(), False)])
    raw = spark.createDataFrame(
        [(bytes.fromhex("02"),), (bytes.fromhex("ff"),), (bytes.fromhex("0200"),)],
        "value binary",
    )
    out = decode_avro_py(raw, s).collect()
    ok = [r for r in out if r["_corrupt"] is None]
    bad = [r for r in out if r["_corrupt"] is not None]
    assert len(ok) == 1 and ok[0]["n"] == 1
    assert len(bad) == 2  # truncated varint + trailing bytes both flagged
