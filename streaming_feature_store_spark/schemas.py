"""Event + feature-table schemas (fixed, versioned — SURVEY.md §1.2).

Mirrors the reference's Avro contracts as Spark StructTypes:
- transactions v1/v2 (schemas/transactions.v1.avsc:1-105, v2 adds optional
  merchant/risk/payment fields — transactions.v2.avsc:43-109)
- clicks v1 (schemas/clicks.v1.avsc)
- devices v1 (schemas/devices.v1.avsc:1-147)

Schema-evolution rule (docs/DesignDoc.md:123, schemas/README.md:20-33):
readers use the NEWEST schema; older data surfaces nulls/defaults for added
optional fields. In Spark that is exactly ``from_avro``/``from_json`` with
the v2 reader schema, or ``mergeSchema`` on files — enforced by
``evolve_to`` below. Enum domains (Spark has no enum type) are declared as
CHECK-style predicates in ``ENUM_DOMAINS`` for validation queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


TRANSACTION_V1 = StructType(
    [
        _f("txn_id", StringType(), False),
        _f("card_id", StringType(), False),
        _f("user_id", StringType(), False),
        _f("amount", DoubleType(), False),
        _f("currency", StringType(), False),
        _f("mcc", StringType(), False),
        _f("device_id", StringType(), False),
        _f("ip_address", StringType(), False),
        _f("geo_country", StringType()),
        _f("geo_city", StringType()),
        _f("geo_lat", DoubleType()),
        _f("geo_lon", DoubleType()),
        _f("timestamp", LongType(), False),  # epoch millis (timestamp-millis)
        _f("processing_time", LongType()),
        _f("is_fraud", BooleanType(), False),
        _f("metadata", MapType(StringType(), StringType()), False),
    ]
)

# v2 = v1 + optional defaulted fields (transactions.v2.avsc:43-59,94-109)
TRANSACTION_V2 = StructType(
    TRANSACTION_V1.fields
    + [
        _f("merchant_id", StringType()),
        _f("merchant_name", StringType()),
        _f("merchant_category", StringType()),
        _f("risk_score", DoubleType()),
        _f("payment_method", StringType()),
    ]
)

CLICK_V1 = StructType(
    [
        _f("event_id", StringType(), False),
        _f("user_id", StringType(), False),
        _f("session_id", StringType(), False),
        _f("page_url", StringType(), False),
        _f("page_type", StringType(), False),
        _f("item_id", StringType()),
        _f("category_id", StringType()),
        _f("action_type", StringType(), False),
        _f("referrer_url", StringType()),
        _f("device_id", StringType(), False),
        _f("user_agent", StringType()),
        _f("ip_address", StringType(), False),
        _f("dwell_time_ms", LongType()),
        _f("scroll_depth", DoubleType()),
        _f("timestamp", LongType(), False),
        _f("processing_time", LongType()),
        _f("experiment_ids", ArrayType(StringType()), False),
        _f("metadata", MapType(StringType(), StringType()), False),
    ]
)

DEVICE_V1 = StructType(
    [
        _f("device_id", StringType(), False),
        _f("fingerprint_hash", StringType(), False),
        _f("user_agent", StringType(), False),
        _f("browser", StringType()),
        _f("os", StringType()),
        _f("device_type", StringType(), False),
        _f("screen_resolution", StringType()),
        _f("timezone", StringType()),
        _f("language", StringType()),
        _f("plugins", ArrayType(StringType()), False),
        _f("ip_address", StringType(), False),
        _f("geo_country", StringType()),
        _f("geo_region", StringType()),
        _f("isp", StringType()),
        _f("is_proxy", BooleanType(), False),
        _f("is_tor", BooleanType(), False),
        _f("risk_score", DoubleType(), False),
        _f("first_seen", LongType(), False),
        _f("last_seen", LongType(), False),
        _f("total_events", LongType(), False),
        _f("timestamp", LongType(), False),
        _f("metadata", MapType(StringType(), StringType()), False),
    ]
)

# Enum domains — validation predicates, since Spark has no enum type
# (transactions.v1.avsc:28-35; v2 adds JPY/CHF; clicks.v1.avsc:28-57;
# devices.v1.avsc:35-43)
ENUM_DOMAINS: dict[str, tuple[str, ...]] = {
    "currency": ("USD", "EUR", "GBP", "CAD", "AUD", "JPY", "CHF"),
    "page_type": ("HOME", "PRODUCT", "CATEGORY", "CART", "CHECKOUT", "PROFILE", "OTHER"),
    "action_type": ("VIEW", "CLICK", "ADD_TO_CART", "REMOVE_FROM_CART", "PURCHASE", "SEARCH"),
    "device_type": ("DESKTOP", "MOBILE", "TABLET", "BOT", "UNKNOWN"),
    "payment_method": ("CHIP", "SWIPE", "CONTACTLESS", "ONLINE", "UNKNOWN"),
}


def evolve_to(df: DataFrame, target: StructType) -> DataFrame:
    """Read older-schema data under a newer reader schema: missing optional
    columns become typed nulls; unknown extra columns are tolerated and
    dropped (consumers must ignore unknown fields — DesignDoc.md:123)."""
    cols = []
    have = {f.name for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def validate_enums(df: DataFrame) -> DataFrame:
    """Append per-enum-column validity flags (CHECK-constraint analog)."""
    out = df
    for col, domain in ENUM_DOMAINS.items():
        if col in df.columns:
            out = out.withColumn(f"{col}_valid", F.col(col).isin(*domain))
    return out


def event_time(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """epoch-ms long → TimestampType ``ts`` (the engine's event-time column).
    Mirrors the reference's ms-heuristic normalizer (watermarks.py:29-64)
    without the heuristic: the schema declares ms, so the conversion is
    exact."""
    return df.withColumn("ts", F.timestamp_millis(F.col(ts_col)))
