"""Slowly-changing-dimension (SCD type 2) history build — turning an
append-only event/change log into interval-versioned entity history.

Reference parity: the reference's feature store keeps only the LATEST row
per entity (streaming/core/sinks/redis_sink.py latest-view semantics, and
our ``streaming/sinks.py`` upsert twin, S7). SCD2 is the warehouse
completion of that surface: every version a key ever had, with its
validity interval — what a training pipeline needs to reconstruct "the
value as of time T" without an as-of join against the raw log every time.

Plan shape (the 100 TB-safe one): ONE window partitioned by entity ordered
by (ts, tiebreak); ``lead`` supplies each row's expiry. No self-join, no
range join — the same single-sort discipline as the as-of join
(operators/asof.py). Dedup of consecutive identical versions is an
optional LAG comparison in the same window (one pass, no extra shuffle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_history(
    df: DataFrame,
    entity_col: str,
    ts_us_col: str,
    attr_cols: list[str],
    tiebreak_col: str = "event_id",
    collapse_unchanged: bool = False,
) -> DataFrame:
    """Interval-version the change log: one row per version with
    ``valid_from_us`` (the event time), ``valid_to_us`` (the next
    version's event time; NULL while current) and ``is_current``.

    ``collapse_unchanged=True`` first drops rows whose ``attr_cols`` all
    equal the previous version's (no-op updates), so intervals cover
    maximal constant runs — the usual SCD2 contract. Comparison is
    null-safe (``<=>``).
    """
    w = Window.partitionBy(entity_col).orderBy(ts_us_col, tiebreak_col)
    out = df.select(entity_col, ts_us_col, tiebreak_col, *attr_cols)
    if collapse_unchanged:
        changed = F.lit(False)
        for c in attr_cols:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        # first row per entity has lag NULL → eqNullSafe false → changed
        out = out.withColumn("_chg", changed).filter(F.col("_chg")).drop("_chg")
        w = Window.partitionBy(entity_col).orderBy(ts_us_col, tiebreak_col)
    nxt = F.lead(ts_us_col).over(w)
    return (
        out.withColumn("valid_from_us", F.col(ts_us_col).cast("long"))
        .withColumn("valid_to_us", nxt.cast("long"))
        .withColumn("is_current", nxt.isNull())
        .drop(ts_us_col)
    )
