"""Geospatial fraud features — haversine distance and impossible-travel
detection.

Reference adjacency: the transaction schema carries ``geo_lat``/``geo_lon``
on every event (`schemas/transactions.v1.avsc:65-74`) and the reference's
fraud track scores per-event velocity (`streaming/core/processors/
transaction.py:91`); the geographic version of that check — two
transactions whose implied travel speed exceeds what an airplane can do —
is the classic card-cloning signal the reference stops short of.

Everything is pure codegen trigonometry over one per-key LAG window (the
same shape as ``time_since_last``): no UDF, no shuffle beyond the key
partition.  ``sin``/``cos``/``asin`` are evaluated by the JVM's libm on
the Spark side and C libm in the DuckDB oracle — identical to within an
ulp on one host (the q101/q153 ``ln`` precedent); flags compare a smooth
speed value against a threshold nowhere near any data mass, and reported
values round once at the presentation edge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (haversine form — numerically stable
    for the small angles typical of consecutive events, unlike the
    spherical law of cosines)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return (
        F.lit(2.0 * EARTH_RADIUS_KM)
        * F.asin(F.least(F.sqrt(a), F.lit(1.0)))
    )


def impossible_travel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    lat_col: str,
    lon_col: str,
    max_speed_kmh: float = 800.0,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Flag consecutive same-key events whose implied travel speed exceeds
    ``max_speed_kmh`` (default: faster than a commercial flight) — the
    standard account-takeover / card-cloning geo signal.

    Adds ``dist_km``, ``gap_s``, ``speed_kmh`` (null for each key's first
    event) and the ``impossible_travel`` flag.  Time gaps are exact
    integer micros; a zero gap with nonzero distance is flagged directly
    (infinite speed) instead of dividing by zero.

    One hash-partitioned LAG window per key — the ``time_since_last``
    plan shape; at 100 TB this is one shuffle on the entity key with all
    trigonometry inside whole-stage codegen.
    """
    tb = tiebreak_col or ts_col
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us, F.col(tb))
    plat, plon, pus = (
        F.lag(lat_col).over(w),
        F.lag(lon_col).over(w),
        F.lag(us).over(w),
    )
    dist = haversine_km(plat, plon, F.col(lat_col), F.col(lon_col))
    gap_s = (us - pus) / F.lit(1_000_000.0)
    speed = F.when(gap_s > 0, dist / (gap_s / 3600.0))
    return (
        df.withColumn("dist_km", dist)
        .withColumn("gap_s", gap_s)
        .withColumn("speed_kmh", speed)
        .withColumn(
            "impossible_travel",
            F.when(pus.isNull(), F.lit(False)).otherwise(
                ((gap_s == 0) & (dist > F.lit(0.001)))
                # speed is null at gap 0: coalesce so the flag is
                # three-valued-logic-safe (False, not null)
                | F.coalesce(speed > F.lit(max_speed_kmh), F.lit(False))
            ),
        )
    )
