"""Device-enrichment join (J2 — declared in the reference, implemented
here), point lookups (J3), and the store façade: materialize → online/
offline parity → replay (T11)."""

import datetime as dt

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.enrich import point_lookup
from streaming_feature_store_spark.registry import default_registry
from streaming_feature_store_spark.store import (
    get_historical,
    materialize,
    parity_check,
    replay,
)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double, event_type string"
    )


def test_materialize_parity_replay(spark, tmp_path):
    latest = str(tmp_path / "latest")
    log = str(tmp_path / "log")
    reg = default_registry()
    view = reg.views["transaction_stats_5m"]
    ev = _events(
        spark,
        [
            (1, 7, BASE + dt.timedelta(seconds=1), 50.0, "view"),
            (2, 7, BASE + dt.timedelta(minutes=10), 150.0, "view"),
            (3, 8, BASE + dt.timedelta(seconds=3), 25.0, "view"),
        ],
    )
    materialize(spark, view, ev, latest, log)

    # online/offline parity must hold right after materialization
    mismatches = parity_check(
        spark, latest, log, "user_id", "window_start_s", ["event_count", "value_sum"]
    )
    assert mismatches.count() == 0

    # point lookup (J3)
    keys = spark.createDataFrame([(7,)], "user_id long")
    served = point_lookup(spark.read.parquet(latest), keys, "user_id").collect()
    assert len(served) == 1 and served[0]["user_id"] == 7

    # serving freshness (T10 tail): freshness_s = now − feature_ts per row
    from streaming_feature_store_spark.store import get_online

    row = get_online(
        spark, latest, keys, "user_id",
        now_s=int((BASE + dt.timedelta(minutes=15)).timestamp()),
    ).collect()[0]
    assert row["freshness_s"] == 300  # newest window starts at minute 10

    # replay (T11): wipe the latest view, rebuild purely from the log
    import shutil

    shutil.rmtree(latest)
    replay(spark, log, latest, "user_id", "window_start_s")
    rebuilt = {r["user_id"]: r for r in spark.read.parquet(latest).collect()}
    assert set(rebuilt) == {7, 8}
    assert rebuilt[7]["value_max"] == 150.0


def test_pit_training_frame_no_leakage(spark):
    feats = spark.createDataFrame(
        [(1, 100, 10, 0.5), (1, 300, 11, 0.9)],
        "user_id long, us long, event_id long, f double",
    )
    labels = spark.createDataFrame(
        [(1, 200, 90, True)], "user_id long, us long, event_id long, y boolean"
    )
    out = get_historical(
        labels, feats, "user_id", "us", "us", ["f"], ["y"], "event_id"
    ).collect()[0]
    # label at t=200 must see the t=100 feature, never the future t=300 one
    assert out["asof_f"] == 0.5 and out["y"] is True
