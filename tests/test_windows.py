"""Known-answer window-aggregation tests.

Mirrors the reference's stream-processor unit cases
(streaming/simple/test_stream_processor.py:67-129): the "transaction trio"
fixture — 3 events for one key inside a 5-minute window — must reproduce the
exact counts/sums/stats (FIXTURES.md §4.1)."""

import datetime as dt

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.windows import (
    multi_horizon_counts,
    time_since_last,
    tumbling_stats,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double, event_type string"
    )


def trio(spark):
    # one card, 3 events at t+1s/2s/3s: 50.0 / 150.0 / 25.0
    return _events(
        spark,
        [
            (1, 7, BASE + dt.timedelta(seconds=1), 50.0, "US"),
            (2, 7, BASE + dt.timedelta(seconds=2), 150.0, "CA"),
            (3, 7, BASE + dt.timedelta(seconds=3), 25.0, "US"),
        ],
    )


def test_transaction_trio_window_stats(spark):
    out = tumbling_stats(
        trio(spark),
        "user_id",
        extra_aggs=[F.countDistinct("event_type").alias("n_types")],
    ).collect()
    assert len(out) == 1
    r = out[0].asDict()
    assert r["event_count"] == 3            # txn_count_5m == 3
    assert r["value_sum"] == 225.0          # amount_sum_5m
    assert r["value_avg"] == 75.0           # amount_avg_5m
    assert r["value_max"] == 150.0
    assert r["value_min"] == 25.0
    assert r["n_types"] == 2                # unique_countries_5m == 2
    assert r["window_start_s"] == int(BASE.timestamp())


def test_time_since_last(spark):
    rows = time_since_last(trio(spark), "user_id").orderBy("event_id").collect()
    assert rows[0]["delta_us"] is None
    assert rows[1]["delta_us"] == 1_000_000
    assert rows[2]["delta_us"] == 1_000_000


def test_multi_horizon_counts(spark):
    # events at t, t+10min, t+40min, t+25h: horizons must differ (the
    # reference's 30m/24h were silently capped at the 5m buffer — A10 bug)
    ev = _events(
        spark,
        [
            (1, 1, BASE, 10.0, "a"),
            (2, 1, BASE + dt.timedelta(minutes=10), 10.0, "a"),
            (3, 1, BASE + dt.timedelta(minutes=40), 10.0, "a"),
            (4, 1, BASE + dt.timedelta(hours=25), 10.0, "a"),
        ],
    )
    out = {r["event_id"]: r for r in multi_horizon_counts(ev, "user_id").collect()}
    assert out[2]["cnt_5m"] == 1 and out[2]["cnt_30m"] == 2
    assert out[3]["cnt_5m"] == 1 and out[3]["cnt_30m"] == 2 and out[3]["cnt_24h"] == 3
    assert out[4]["cnt_24h"] == 1  # everything else aged out


def test_sliding_window_membership(spark):
    from streaming_feature_store_spark.operators.windows import sliding_stats

    ev = _events(spark, [(1, 1, BASE + dt.timedelta(seconds=30), 5.0, "a")])
    rows = sliding_stats(ev, "user_id").collect()
    # one event belongs to exactly window/slide = 5 sliding windows
    assert len(rows) == 5
    starts = sorted(r["window_start_s"] for r in rows)
    base_s = int(BASE.timestamp())
    assert starts == [base_s - 240, base_s - 180, base_s - 120, base_s - 60, base_s]


def test_sliding_pane_form_equals_generator_form(spark):
    """r12: sliding_stats computes 5m/1m windows as two-level slide panes
    (pre-agg per 1-min bin, decomposed combine per window).  Pin pane ≡
    generator on a frame that exercises nulls, multi-event bins, bin
    boundaries and multiple keys — and pin the fallback path for a
    non-divisible spec."""
    import random

    from streaming_feature_store_spark.operators.windows import sliding_stats

    rng = random.Random(12)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                rng.randrange(5),
                BASE + dt.timedelta(seconds=rng.randrange(0, 3600)),
                None if i % 17 == 0 else round(rng.uniform(-50, 500), 2),
                "a",
            )
        )
    ev = _events(spark, rows)

    def generator_form(df):
        from streaming_feature_store_spark.functions.exprs import dsum

        return (
            df.groupBy(
                F.col("user_id"), F.window("ts", "5 minutes", "1 minute").alias("w")
            )
            .agg(
                F.count("*").alias("event_count"),
                dsum("value").alias("value_sum"),
                F.max("value").alias("value_max"),
            )
            .withColumn("window_start_s", F.col("w.start").cast("long"))
            .drop("w")
        )

    pane = sliding_stats(ev, "user_id")
    gen = generator_form(ev)
    assert pane.columns == gen.columns
    assert [f.dataType for f in pane.schema] == [f.dataType for f in gen.schema]
    canon = lambda df: sorted(tuple(map(repr, r)) for r in df.collect())  # noqa: E731
    assert canon(pane) == canon(gen)

    # non-divisible spec falls back to the generator plan (same results by
    # construction; just pin that it still answers)
    odd = sliding_stats(ev, "user_id", window="90 seconds", slide="1 minute")
    assert odd.columns == pane.columns
    assert odd.count() > 0
