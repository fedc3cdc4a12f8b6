"""Streaming deduplication: at-least-once transport → exactly-once events.

Kafka delivery in the reference's simple engine is at-least-once
(auto-commit consumer — stream_processor.py:93, SURVEY §2.6 T6); redelivered
events silently double-count its features. Spark's
``dropDuplicatesWithinWatermark`` dedups on the id columns alone while
expiring per-id state at the watermark horizon — the exact semantics
wanted here. (Plain ``dropDuplicates(id_cols)`` would only evict state if
the event-time column were part of the key subset; with id-only keys its
state grows without bound on a long-running stream.)

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
    """Drop redelivered events by id; per-id state expires at the watermark
    horizon (bounded state ≈ ids-per-horizon). Batch frames fall back to
    plain dropDuplicates (no state to bound)."""
    if not stream.isStreaming:
        return stream.dropDuplicates(id_cols)
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        id_cols
    )
