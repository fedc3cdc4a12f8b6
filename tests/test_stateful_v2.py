"""transformWithState per-event features (T4 closure): same per-event
emission contract as v1, PLUS idle-key state eviction via event-time
timers — the key's buffer is purged and a tombstone row emitted once the
watermark passes last-activity + idle TTL."""

import datetime as dt
import os

import pytest

# transformWithState's state-server protocol is protobuf-encoded; the rig
# has no protobuf wheel (same class of environmental gate as spark-avro in
# test_avro.py). The module itself imports and plan-builds without it, so
# only the Spark-INTEGRATION tests below gate on it (via this marker);
# the callback-logic harness at the bottom of this file runs everywhere.
try:
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

needs_protobuf = pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="protobuf wheel absent: transformWithState worker protocol unavailable",
)

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from streaming_feature_store_spark.streaming.stateful_v2 import (
    ROCKSDB_PROVIDER,
    per_event_features_ttl,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)


def _run(spark, src, out, ckpt):
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    feats = per_event_features_ttl(
        stream, window_s=300, allowed_lateness_s=60, idle_ttl_s=600
    )
    q = (
        feats.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out)


@needs_protobuf
def test_per_event_ttl_eviction(spark, tmp_path):
    src, out, ckpt = str(tmp_path / "s"), str(tmp_path / "o"), str(tmp_path / "c")
    os.makedirs(src)

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    # batch 1: key 7 trio inside one window — v1 contract must hold as-is
    write(
        [
            (7, BASE + dt.timedelta(seconds=1), 50.0),
            (7, BASE + dt.timedelta(seconds=2), 150.0),
            (7, BASE + dt.timedelta(seconds=3), 25.0),
        ]
    )
    res = [r for r in _run(spark, src, out, ckpt).collect() if r["event_count"] > 0]
    assert len(res) == 3
    last = max(res, key=lambda r: r["event_us"])
    assert last["event_count"] == 3 and last["value_sum"] == 225.0

    # batch 2: key 8 two hours later pushes the watermark far past key 7's
    # last activity + 600 s TTL → key 7's timer fires, state purged, and a
    # tombstone (event_count = −1) surfaces. A second advance guarantees the
    # timer batch has run regardless of how availableNow slices batches.
    write([(8, BASE + dt.timedelta(hours=2), 10.0)])
    _run(spark, src, out, ckpt)
    write([(8, BASE + dt.timedelta(hours=2, minutes=1), 20.0)])
    res3 = _run(spark, src, out, ckpt).collect()
    tombs = [r for r in res3 if r["event_count"] == -1]
    assert [t["entity_id"] for t in tombs] == ["7"]
    # eviction really cleared the buffer: a fresh key-7 event 2h on sees an
    # empty window (count 1), and is NOT late-dropped (max_us was cleared)
    write([(7, BASE + dt.timedelta(hours=2, minutes=2), 5.0)])
    res4 = {
        (r["entity_id"], r["event_us"]): r
        for r in _run(spark, src, out, ckpt).collect()
        if r["event_count"] > 0
    }
    us = int((BASE + dt.timedelta(hours=2, minutes=2)).timestamp() * 1_000_000)
    assert res4[("7", us)]["event_count"] == 1


# ---------------------------------------------------------------------------
# Logic harness (runs IN THIS RIG): the protobuf gate above blocks only the
# worker-side state-server protocol; the processor's own callback logic is
# plain Python over pandas and is driven here with fake state/timer handles,
# pinned to a naive trailing-window recompute. The Spark integration path
# stays env-gated; this converts "code exists" into "logic verified".
# ---------------------------------------------------------------------------


def _make_processor():
    from streaming_feature_store_spark.streaming.stateful_v2 import (
        PerEventProcessor,
    )

    return PerEventProcessor(
        window_us=300_000_000, lateness_us=60_000_000, idle_ttl_ms=3_600_000
    )


class _FakeListState:
    def __init__(self):
        self.rows = []

    def get(self):
        return iter(self.rows)

    def put(self, rows):
        self.rows = list(rows)

    def clear(self):
        self.rows = []


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = v

    def clear(self):
        self.v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = []

    def getListState(self, name, schema):
        return self.states.setdefault(name, _FakeListState())

    def getValueState(self, name, schema):
        return self.states.setdefault(name, _FakeValueState())

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


class _FakeExpiry:
    def __init__(self, ms):
        self.ms = ms

    def getExpiryTimeInMs(self):
        return self.ms


def test_processor_logic_matches_naive_recompute():
    import pandas as pd

    proc = _make_processor()
    h = _FakeHandle()
    proc.init(h)

    # batch 1: in-order events; batch 2: one within-lateness late event and
    # one beyond-lateness drop
    b1 = pd.DataFrame(
        {"us": [1_000_000_000, 1_100_000_000, 1_400_000_000],
         "value": [10.0, 20.0, 30.0]}
    )
    out1 = list(proc.handleInputRows(("u1",), iter([b1]), None))
    b2 = pd.DataFrame(
        {"us": [1_390_000_000, 1_000_000_000], "value": [40.0, 99.0]}
    )
    out2 = list(proc.handleInputRows(("u1",), iter([b2]), None))

    rows = pd.concat(out1 + out2).reset_index(drop=True)
    # beyond-lateness event (1_000s vs max 1_400s, lateness 60s) dropped
    assert len(rows) == 4
    # naive recompute of the trailing 300s window per accepted event
    accepted = [(1_000_000_000, 10.0), (1_100_000_000, 20.0),
                (1_400_000_000, 30.0), (1_390_000_000, 40.0)]
    buf = []
    for i, (us, v) in enumerate(accepted):
        buf.append((us, v))
        buf = [(t, x) for t, x in buf if t >= us - 300_000_000]
        vals = [x for _, x in buf]
        r = rows.iloc[i]
        assert r["event_count"] == len(vals)
        assert abs(r["value_sum"] - sum(vals)) < 1e-9
        assert r["value_max"] == max(vals) and r["value_min"] == min(vals)
    # late flag set exactly on the out-of-order accepted event
    assert list(rows["late_accepted"]) == [False, False, False, True]
    # exactly ONE armed timer at last-activity + ttl
    assert h.timers == [1_400_000_000 // 1000 + 3_600_000]

    # idle expiry: tombstone emitted, state cleared
    tomb = list(
        proc.handleExpiredTimer(("u1",), None, _FakeExpiry(h.timers[0]))
    )
    assert len(tomb) == 1 and tomb[0].iloc[0]["event_count"] == -1
    assert h.states["buf"].rows == []
    assert not h.states["max_us"].exists()

    # events after eviction start a FRESH window (no ghost state)
    b3 = pd.DataFrame({"us": [2_000_000_000], "value": [5.0]})
    out3 = list(proc.handleInputRows(("u1",), iter([b3]), None))
    assert out3[0].iloc[0]["event_count"] == 1
