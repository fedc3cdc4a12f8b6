"""Sessionization — gap-based session windows + funnel/engagement features.

Reference parity: per-(user, session) mutable session state with 30-minute
expiry (streaming/core/processors/clickstream.py:31,47-65;
generators/base_generator.py:291-294), funnel ratios (clickstream.py:96-97)
and the engagement score (clickstream.py:100-104).

Batch path uses ``F.session_window`` (gap-merged event-time sessions — the
exact Structured Streaming primitive the streaming path reuses unchanged).
Session identity in output is (entity, session_start); we emit min/max event
time rather than the gap-padded window end so results are oracle-comparable.

Scale: session_window aggregation is one shuffle keyed by entity; state in
streaming mode is watermark-evicted, which by construction fixes the
reference's never-GC'd session leak (clickstream.py:27-31, SURVEY.md §4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from streaming_feature_store_spark.functions.exprs import dsum


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Aggregate events into gap-separated sessions per entity.

    A new session starts when the gap since the previous event is >= ``gap``
    (Spark merges events strictly inside the gap window).
    """
    aggs = [
        F.count("*").alias("n_events"),
        F.min(F.unix_micros(F.col(ts_col))).alias("session_start_us"),
        F.max(F.unix_micros(F.col(ts_col))).alias("session_end_us"),
    ] + (extra_aggs or [])
    return (
        df.groupBy(F.col(entity_col), F.session_window(ts_col, gap).alias("sw"))
        .agg(*aggs)
        .drop("sw")
    )


def funnel_features(
    df: DataFrame,
    entity_col: str,
    type_col: str = "event_type",
    ts_col: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session funnel counts + conversion ratios (A15/A16).

    ``conversion_rate = purchases / max(views, 1)`` mirrors the reference's
    guarded denominators (clickstream.py:96-97 uses ``max(cart_adds, 1)``).
    """
    cnt = lambda t: F.sum(F.when(F.col(type_col) == t, 1).otherwise(0))
    sess = sessionize(
        df,
        entity_col,
        ts_col,
        gap,
        extra_aggs=[
            cnt("view").alias("views"),
            cnt("click").alias("clicks"),
            cnt("purchase").alias("purchases"),
            cnt("signup").alias("signups"),
            cnt("error").alias("errors"),
            dsum("value").alias("value_sum"),
        ],
    )
    return sess.withColumn(
        "conversion_rate",
        F.round(F.col("purchases") / F.greatest(F.col("views"), F.lit(1)), 6),
    ).withColumn(
        "session_minutes",
        F.round((F.col("session_end_us") - F.col("session_start_us")) / 6.0e7, 4),
    )
