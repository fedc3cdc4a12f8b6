"""Sessionization semantics, incl. the exact-gap boundary: Spark's
``session_window`` MERGES an event arriving exactly ``gap`` after the
previous one (new session only when diff > gap, strictly) — pinned here
because the q08 DuckDB oracle encodes the same contract — plus the
clickstream-funnel known-answer case (test_stream_processor.py:133-217,
FIXTURES.md §4.2)."""

import datetime as dt

from streaming_feature_store_spark.operators.sessions import funnel_features, sessionize

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double, event_type string"
    )


def test_gap_boundary_semantics(spark):
    gap = dt.timedelta(minutes=30)
    ev = _events(
        spark,
        [
            (1, 1, BASE, 1.0, "view"),
            (2, 1, BASE + gap, 1.0, "view"),                   # == gap → merged
            (3, 1, BASE + 2 * gap + dt.timedelta(seconds=1), 1.0, "view"),  # > gap → new
        ],
    )
    sess = sessionize(ev, "user_id").collect()
    assert sorted(s["n_events"] for s in sess) == [1, 2]


def test_clickstream_funnel(spark):
    # 4-event session: view → click → view(cart add analog) → purchase
    ev = _events(
        spark,
        [
            (1, 9, BASE + dt.timedelta(seconds=0), 1.0, "view"),
            (2, 9, BASE + dt.timedelta(seconds=60), 1.0, "click"),
            (3, 9, BASE + dt.timedelta(seconds=120), 1.0, "view"),
            (4, 9, BASE + dt.timedelta(seconds=180), 9.0, "purchase"),
        ],
    )
    out = funnel_features(ev, "user_id").collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["n_events"] == 4               # pages_per_session == 4
    assert r["purchases"] == 1
    assert r["conversion_rate"] == 0.5      # purchases / views = 1/2
    assert r["session_minutes"] == 3.0
    assert r["value_sum"] == 12.0
