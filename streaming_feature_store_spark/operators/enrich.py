"""Stream-stream / stream-table enrichment joins (J2/J3).

The reference *declared* a transactions ⟵(device_id)⟶ devices interval join
with state TTL but never implemented it (docs/DesignDoc.md:81; the device
topic + DLQ are configured at config.py:54,59 and never consumed). We
implement it:

- **batch/as-of form**: latest device profile at or before the transaction
  time (the union+last_value PIT pattern — linear, no interval explosion).
- **streaming form**: watermarked stream-stream left interval join — device
  record valid from its timestamp until ``valid_for`` later; Spark clears
  join state by watermark, which is exactly the "state TTL" the design
  called for.
- **point-lookup form** (J3): broadcast the (small) request/key set against
  the latest view — the Redis HGETALL batch analog (inference/features.py:
  129-246) without the string round-trip.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import broadcast


def enrich_with_devices_stream(
    txns: DataFrame,
    devices: DataFrame,
    valid_for: str = "24 hours",
    tx_watermark: str = "65 seconds",
    dev_watermark: str = "65 seconds",
) -> DataFrame:
    """Streaming interval join: each transaction picks up device attributes
    whose record time is within [tx.ts − valid_for, tx.ts]."""
    tx = txns.withWatermark("ts", tx_watermark)
    dev = (
        devices.withWatermark("dev_ts", dev_watermark)
        .select(
            F.col("device_id").alias("d_device_id"),
            "dev_ts",
            "is_proxy",
            "is_tor",
            F.col("risk_score").alias("device_risk_score"),
            F.col("geo_country").alias("device_geo_country"),
        )
    )
    cond = (
        (tx["device_id"] == dev["d_device_id"])
        & (dev["dev_ts"] <= tx["ts"])
        & (dev["dev_ts"] >= tx["ts"] - F.expr(f"INTERVAL {valid_for}"))
    )
    return tx.join(dev, cond, "leftOuter").drop("d_device_id")


def point_lookup(
    latest_view: DataFrame, request_keys: DataFrame, key_col: str
) -> DataFrame:
    """J3: serve features for a batch of entity keys — broadcast hash join of
    the request set against the latest view (keys are the small side)."""
    return latest_view.join(broadcast(request_keys), key_col, "right")


def interval_join(
    events: DataFrame,
    spans: DataFrame,
    event_key: str,
    span_key: str,
    event_us: str = "us",
    span_start_us: str = "start_us",
    span_end_us: str = "end_us",
) -> DataFrame:
    """Batch interval join (the J2 stream-stream interval join's offline
    twin): each event matches every span of the same key whose
    ``[start_us, end_us)`` window contains the event's timestamp.  With an
    equi key present this is ONE hash join carrying the two range
    predicates as residual conditions — no binning needed; the purely
    temporal (keyless) case should bucket the time axis first (the LSH
    banding trick on time) to avoid a broadcast-nested-loop.
    """
    cond = (
        (events[event_key] == spans[span_key])
        & (events[event_us] >= spans[span_start_us])
        & (events[event_us] < spans[span_end_us])
    )
    return events.join(spans, cond)
