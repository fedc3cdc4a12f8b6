"""Streaming deduplication: at-least-once transport → exactly-once events.

Kafka delivery in the reference's simple engine is at-least-once
(auto-commit consumer — stream_processor.py:93, SURVEY §2.6 T6); redelivered
events silently double-count its features. Spark's `dropDuplicates` over a
watermarked stream keeps per-key dedup state bounded by the watermark
horizon: an event id seen twice within the horizon is dropped, and state for
ids older than the watermark is evicted automatically.

Scale: dedup state is keyed by (id), shuffle-partitioned like any keyed op;
the watermark bound means state size ≈ ids-per-horizon, independent of
stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered events by id within the watermark horizon."""
    return stream.withWatermark(ts_col, horizon).dropDuplicates(id_cols)
