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

    A new session starts when the gap since the previous event EXCEEDS
    ``gap`` — ``F.session_window`` windows are end-inclusive, so two
    events exactly one gap apart still merge (verified empirically; the
    q230 incremental merge and its oracle pin the same rule).
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


def _gap_to_us(gap: str) -> int:
    """Parse a SQL-style interval string ('30 minutes') to exact micros."""
    import re

    m = re.fullmatch(
        r"\s*(\d+)\s*(second|minute|hour|day)s?\s*", gap.lower()
    )
    if not m:
        raise ValueError(f"unsupported gap interval: {gap!r}")
    mult = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }[m.group(2)]
    return int(m.group(1)) * mult


def session_index_merge(
    delta: DataFrame,
    index: DataFrame,
    cutoff: str | int,
    entity_col: str,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    validate: bool = True,
) -> DataFrame:
    """Incremental sessionization against a persisted session table — the
    daily-ingest shape of ``sessionize``: history is never re-sessionized;
    only sessions that can still grow meet the delta.

    Contract: every indexed event happened AT-OR-BEFORE ``cutoff`` and
    every delta event AT/AFTER it (the daily-partition invariant;
    same-microsecond ties AT the boundary are allowed — a tie gap-merges
    with gap 0 exactly as a full recompute would).  Under that contract
    at most ONE session per entity is still "open" (ends within ``gap``
    of the cutoff) — two would have to be gap-separated, pushing the
    second past the cutoff — so:

    - sessions ending before ``cutoff - gap`` are CLOSED: no delta event
      can attach (its distance already exceeds the gap); they pass
      through untouched, never shuffled;
    - each open session becomes one atomic interval row and gap-merges
      with the delta's event points per entity (gaps-and-islands over
      exact integer micros — the same break rule ``F.session_window``
      applies: a new session only when the gap is EXCEEDED; exactly-gap
      events still merge), yielding the updated tail.

    Returns the updated session table (same schema as ``sessionize``:
    entity, n_events, session_start_us, session_end_us), equal to a full
    recompute over base ∪ delta (the oracled q230 guarantee).

    ``validate=True`` enforces the contract with two single-row
    aggregates (min delta ts, max indexed end — bounded driver reads);
    disable only when the partition layout already guarantees it.

    Scale shape: the closed set is a pass-through scan (in production a
    partition-pruned read); the shuffle is |open sessions| + |delta|
    rows keyed by entity — the day's data, not history.
    """
    import datetime as dt

    gap_us = _gap_to_us(gap)
    if isinstance(cutoff, int):
        # exact epoch-micros form (the streaming sink derives the cutoff
        # FROM event micros — a string round-trip risks 1-us float skew)
        cutoff_us = cutoff
    else:
        cut = dt.datetime.fromisoformat(cutoff)
        if cut.tzinfo is None:
            cut = cut.replace(tzinfo=dt.timezone.utc)
        cutoff_us = int(cut.timestamp() * 1_000_000)

    if validate:
        mn = delta.agg(
            F.min(F.unix_micros(F.col(ts_col))).alias("m")
        ).collect()[0]["m"]
        if mn is not None and mn < cutoff_us:
            raise ValueError(
                f"session_index_merge: delta has events before cutoff "
                f"{cutoff!r} — the incremental contract is violated; "
                "re-sessionize the affected range instead"
            )
        # strict > : an indexed session ENDING exactly at the cutoff is a
        # same-microsecond tie with the delta's first event (realistic at
        # a micro-batch boundary when the sink derives cutoff = batch min
        # ts).  Ties are provably safe for the gaps-and-islands merge —
        # gap 0 merges identically to a full recompute, and the at-most-
        # one-open-session argument still holds (a second open session
        # would need start > cutoff, impossible for events <= cutoff) —
        # so only end > cutoff violates the contract.
        mx = index.agg(F.max("session_end_us").alias("m")).collect()[0]["m"]
        if mx is not None and mx > cutoff_us:
            raise ValueError(
                f"session_index_merge: index has sessions after cutoff "
                f"{cutoff!r} — pass the cutoff the index was built to"
            )

    from pyspark.sql import Window

    closed = index.filter(
        F.col("session_end_us") < F.lit(cutoff_us - gap_us)
    )
    open_ = index.filter(
        F.col("session_end_us") >= F.lit(cutoff_us - gap_us)
    )
    iv = open_.select(
        F.col(entity_col),
        F.col("session_start_us").alias("_s"),
        F.col("session_end_us").alias("_e"),
        F.col("n_events").cast("long").alias("_n"),
    )
    pts = delta.select(
        F.col(entity_col),
        F.unix_micros(F.col(ts_col)).alias("_s"),
        F.unix_micros(F.col(ts_col)).alias("_e"),
        F.lit(1).cast("long").alias("_n"),
    )
    u = iv.unionByName(pts)
    w = Window.partitionBy(entity_col).orderBy("_s", "_e")
    brk = F.when(
        F.lag("_e").over(w).isNull()
        | (F.col("_s") - F.lag("_e").over(w) > F.lit(gap_us)),
        1,
    ).otherwise(0)
    flagged = u.select(
        F.col(entity_col), "_s", "_e", "_n", brk.alias("_brk")
    )
    sid = F.sum("_brk").over(
        Window.partitionBy(entity_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tail = (
        flagged.select(F.col(entity_col), "_s", "_e", "_n", sid.alias("_sid"))
        .groupBy(entity_col, "_sid")
        .agg(
            F.sum("_n").alias("n_events"),
            F.min("_s").alias("session_start_us"),
            F.max("_e").alias("session_end_us"),
        )
        .drop("_sid")
    )
    return closed.select(
        entity_col, "n_events", "session_start_us", "session_end_us"
    ).unionByName(tail)
