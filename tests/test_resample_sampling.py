"""Unit pins for the round-4 additions: linear interpolation, weighted
priority sampling, and the batch interval join (q133-q135 exercise them
against DuckDB oracles; these tests pin the hand-checkable semantics)."""

import datetime as dt

import pytest

from streaming_feature_store_spark.operators.curation import (
    weighted_priority_sample,
)
from streaming_feature_store_spark.operators.enrich import interval_join
from streaming_feature_store_spark.operators.windows import interpolate_linear


def _ts(s: int):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_interpolate_linear_known_answer(spark):
    # user 1: readings at t=0 (v=10) and t=10 (v=20); gap rows at t=4, t=6
    rows = [
        (1, 1, _ts(0), 10.0),
        (1, 2, _ts(4), None),
        (1, 3, _ts(6), None),
        (1, 4, _ts(10), 20.0),
        # user 2: leading/trailing nulls -> nearest fill
        (2, 5, _ts(0), None),
        (2, 6, _ts(5), 7.0),
        (2, 7, _ts(9), None),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, reading double"
    )
    out = {
        r["event_id"]: r["reading_interp"]
        for r in interpolate_linear(df, "user_id").collect()
    }
    assert out[1] == 10.0 and out[4] == 20.0
    assert out[2] == pytest.approx(14.0)  # 10 + (20-10) * 4/10
    assert out[3] == pytest.approx(16.0)
    assert out[5] == 7.0 and out[7] == 7.0  # edge fills


def test_interpolate_equal_timestamp_guard(spark):
    # null reading sandwiched between two observations at the SAME us:
    # the 0/0 slope is guarded to the previous value, never NaN
    rows = [(1, 1, _ts(0), 5.0), (1, 2, _ts(0), None), (1, 3, _ts(0), 9.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, reading double"
    )
    out = {
        r["event_id"]: r["reading_interp"]
        for r in interpolate_linear(df, "user_id").collect()
    }
    assert out[2] == 5.0


def test_weighted_sample_exact_k_and_determinism(spark):
    import pyspark.sql.functions as F

    df = spark.range(500).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    s1 = weighted_priority_sample(df, 10, "w", "event_id", "grp")
    got = s1.groupBy("grp").count().collect()
    assert all(r["count"] == 10 for r in got) and len(got) == 3
    # deterministic: a repartitioned rerun selects the identical ids
    ids1 = sorted(r["event_id"] for r in s1.collect())
    s2 = weighted_priority_sample(
        df.repartition(7), 10, "w", "event_id", "grp"
    )
    assert sorted(r["event_id"] for r in s2.collect()) == ids1


def test_weighted_sample_bias_toward_heavy_rows(spark):
    import pyspark.sql.functions as F

    # half the rows carry 100x weight; they should dominate the sample
    df = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, 100.0).otherwise(1.0).alias("w"),
    )
    out = weighted_priority_sample(df, 200, "w", "event_id")
    heavy = sum(1 for r in out.collect() if r["event_id"] % 2 == 0)
    assert heavy > 170  # E[heavy] ~ 198; far from the unweighted 100


def test_interval_join_boundaries(spark):
    ev = spark.createDataFrame(
        [(1, 100), (1, 150), (1, 200), (2, 100)], "user_id int, us long"
    )
    spans = spark.createDataFrame(
        [(1, 100, 200, "a"), (2, 150, 300, "b")],
        "k int, start_us long, end_us long, span_id string",
    )
    got = sorted(
        (r["span_id"], r["us"])
        for r in interval_join(ev, spans, "user_id", "k").collect()
    )
    # start inclusive, end exclusive; key must match
    assert got == [("a", 100), ("a", 150)]


def test_negative_sample_excludes_positives_exact_k(spark):
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.operators.curation import (
        negative_sample,
    )

    items = spark.range(100).select(F.col("id").alias("item_id"))
    # each user interacted with 10 items
    inter = spark.range(5).select(F.col("id").alias("user_id")).crossJoin(
        spark.range(10).select((F.col("id") * 7).alias("item_id"))
    )
    out = negative_sample(inter, items, k=6, oversample=3)
    rows = out.collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r["item_id"])
    assert all(len(v) == 6 for v in per_user.values()) and len(per_user) == 5
    pos = {(r["user_id"], r["item_id"]) for r in inter.collect()}
    assert all((r["user_id"], r["item_id"]) not in pos for r in rows)
    # deterministic under repartition
    out2 = negative_sample(inter.repartition(4), items, k=6, oversample=3)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, out2.collect()))


def test_edit_distance_pairs_planted_typos(spark):
    from streaming_feature_store_spark.operators.text import (
        edit_distance_pairs,
    )

    names = [
        "acme corporation", "acme corpration",   # deletion (d=1)
        "acme korporation",                       # substitution vs #1 (d=1)
        "globex", "globex inc",                   # d=4: not a pair
        "initech", "initechh",                    # insertion (d=1)
        "unrelated name",
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in edit_distance_pairs(df, "name", max_dist=2).collect()
    }
    assert ("acme corporation", "acme corpration", 1) in got
    assert ("acme corporation", "acme korporation", 1) in got
    assert ("acme corpration", "acme korporation", 2) in got
    assert ("initech", "initechh", 1) in got
    assert not any("globex" in a or "globex" in b for a, b, _ in got)
