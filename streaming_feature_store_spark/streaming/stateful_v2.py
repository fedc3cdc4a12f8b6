"""Per-event keyed-state features on the transformWithState API — the T4
closure (SURVEY.md §2.6): idle-key state TTL via real event-time timers.

``stateful.per_event_features`` (applyInPandasWithState) carries the exact
per-event reference semantics but cannot expire idle keys in this PySpark
build (``GroupState.setTimeoutDuration`` hard-crashes the worker — see its
NOTE). The arbitrary-state v2 API (`transformWithStateInPandas`, Spark
4.0+) provides what the v1 API could not:

- **typed state variables** — the event buffer is a native ListState of
  (us, value) rows and the lateness high-watermark a ValueState, instead of
  v1's csv-packed strings (no per-batch encode/decode, state store diffs
  are per-element);
- **event-time timers** — after each batch the key re-arms one timer at
  ``max_event_time + idle_ttl``; when the stream's watermark passes it with
  no new events, ``handleExpiredTimer`` purges the buffer and emits a
  tombstone row (event_count = −1), making eviction observable downstream
  exactly like the reference's idle-key cleanup would be
  (processors/transaction.py:28-31 leaks this state forever — the fix the
  reference never shipped).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass =
org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``),
which transformWithState mandates; the bundled provider works in local
mode. Scale shape matches v1: one keyed exchange, Arrow-batched per-key
frames, per-key state bounded by the window span — plus timers now bound
the KEY COUNT by activity horizon, which v1 could not.

Environmental gate: the v2 state-server protocol is protobuf-encoded and
this container ships no ``protobuf`` wheel, so the operator plan builds
but cannot EXECUTE here (worker init raises ImportError from
``pyspark/sql/streaming/proto``); ``tests/test_stateful_v2.py`` skips
cleanly in that case and runs wherever protobuf is present (any standard
Spark 4 deployment). The v1 path (``stateful.per_event_features``) remains
the rig-proven default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from streaming_feature_store_spark.streaming.stateful import PER_EVENT_OUTPUT

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

_COLS = [f.name for f in PER_EVENT_OUTPUT.fields]


class PerEventProcessor(StatefulProcessor):
    """Trailing-window per-event stats with two-tier lateness (T2) and
    idle-key TTL (T4). One output row per accepted event; one tombstone row
    (event_count = −1) per evicted idle key."""

    def __init__(self, window_us: int, lateness_us: int, idle_ttl_ms: int):
        self._window_us = window_us
        self._lateness_us = lateness_us
        self._idle_ttl_ms = idle_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._buf = handle.getListState("buf", "us long, value double")
        self._max = handle.getValueState("max_us", "max_us long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        buf = [(int(us), float(v)) for us, v in self._buf.get()]
        max_us = self._max.get()[0] if self._max.exists() else 0

        out = []
        for pdf in rows:
            pdf = pdf.sort_values("us", kind="stable")
            for us, val in zip(pdf["us"], pdf["value"]):
                us = int(us)
                late = us < max_us
                if late and us < max_us - self._lateness_us:
                    continue  # beyond allowed lateness → drop (T2)
                max_us = max(max_us, us)
                buf.append((us, float(val)))
                cutoff = us - self._window_us
                buf = [(t, v) for t, v in buf if t >= cutoff]
                vals = [v for _, v in buf]
                s = float(sum(vals))
                n = len(vals)
                out.append(
                    (
                        key[0],
                        us,
                        n,
                        round(s, 6),
                        round(s / n, 6),
                        max(vals),
                        min(vals),
                        bool(late),
                    )
                )

        self._buf.put(buf)
        self._max.update((max_us,))
        # re-arm the single idle timer: expire when the watermark passes
        # last-activity + ttl. Event-time timers survive restarts with the
        # checkpoint, unlike any driver-side bookkeeping.
        for t in self._handle.listTimers():
            self._handle.deleteTimer(t)
        self._handle.registerTimer(max_us // 1000 + self._idle_ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    def handleExpiredTimer(
        self, key: tuple, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        self._buf.clear()
        self._max.clear()
        yield pd.DataFrame(
            [(key[0], expiredTimerInfo.getExpiryTimeInMs() * 1000, -1, None, None, None, None, False)],
            columns=_COLS,
        )

    def close(self) -> None:
        pass


def per_event_features_ttl(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 300,
    allowed_lateness_s: int = 60,
    idle_ttl_s: int = 3600,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming per-event features with idle-key state eviction.

    Same output contract as ``stateful.per_event_features`` plus tombstone
    rows (event_count = −1) when a key's state is purged after
    ``idle_ttl_s`` of event-time inactivity. The watermark drives both
    lateness and timer firing.
    """
    import pyspark.sql.functions as F

    prepared = events.withWatermark(ts_col, watermark_delay).select(
        F.col(entity_col).cast("string").alias("entity_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).cast("double").alias("value"),
        F.col(ts_col).alias("_event_ts"),
    )
    return prepared.groupBy("entity_id").transformWithStateInPandas(
        statefulProcessor=PerEventProcessor(
            window_s * 1_000_000, allowed_lateness_s * 1_000_000, idle_ttl_s * 1000
        ),
        outputStructType=PER_EVENT_OUTPUT,
        outputMode="Append",
        timeMode="EventTime",
    )
