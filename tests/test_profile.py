"""Profiling-operator tests: null/distinct accounting and numeric ranges
on a hand-computable frame, and the exact-k sampler's quota + determinism."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.curation import (
    sample_exact_per_group,
)
from streaming_feature_store_spark.operators.profile import (
    numeric_ranges,
    profile_columns,
)


def test_profile_columns_known_answer(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, None, 2.0), (4, "b", 2.0)],
        "id bigint, s string, v double",
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    assert rows["id"]["n_rows"] == 4 and rows["id"]["n_null"] == 0
    assert rows["id"]["n_distinct"] == 4
    assert rows["s"]["n_null"] == 1 and rows["s"]["n_distinct"] == 2
    assert rows["v"]["n_null"] == 1 and rows["v"]["n_distinct"] == 2
    assert abs(rows["s"]["null_frac"] - 0.25) < 1e-9


def test_profile_columns_negative_zero_and_type_gate(spark):
    """Regression (ADVICE r3): -0.0 and 0.0 render as distinct strings but
    compare equal natively — the melt must normalize floats first; and
    non-primitive columns must raise instead of silently string-casting."""
    import pytest

    df = spark.createDataFrame(
        [(1, -0.0), (2, 0.0), (3, 1.5), (4, None)], "id bigint, v double"
    )
    rows = {r["column"]: r for r in profile_columns(df).collect()}
    # native COUNT(DISTINCT v) = 2 (-0.0 == 0.0, null ignored)
    native = df.select(F.countDistinct("v")).collect()[0][0]
    assert native == 2
    assert rows["v"]["n_distinct"] == 2

    arr = df.select("id", F.array("v").alias("a"))
    with pytest.raises(ValueError, match="non-primitive"):
        profile_columns(arr)


def test_numeric_ranges_known_answer(spark):
    df = spark.createDataFrame(
        [(1.0, 10), (3.0, 20), (None, 30)], "x double, y bigint"
    )
    rows = {r["column"]: r for r in numeric_ranges(df, ["x", "y"]).collect()}
    assert rows["x"]["min_value"] == 1.0 and rows["x"]["max_value"] == 3.0
    assert abs(rows["x"]["avg_value"] - 2.0) < 1e-9
    assert rows["y"]["min_value"] == 10.0 and rows["y"]["max_value"] == 30.0
    assert abs(rows["y"]["avg_value"] - 20.0) < 1e-9


def test_sample_exact_per_group_quota_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "big" if i < 87 else "small") for i in range(90)],
        "doc_id bigint, source string",
    )
    out1 = sample_exact_per_group(df, k=5).collect()
    by_src = {}
    for r in out1:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["big"]) == 5          # quota enforced
    assert len(by_src["small"]) == 3         # group smaller than k: keep all
    # deterministic across a different partitioning
    out2 = sample_exact_per_group(df.repartition(7), k=5).collect()
    assert {(r["doc_id"], r["source"]) for r in out1} == {
        (r["doc_id"], r["source"]) for r in out2
    }


def test_value_histogram_constant_and_fill(spark):
    """hi == lo degenerates to width 1 (all mass in bin 0); empty bins are
    filled so the output is always exactly n_bins rows."""
    from streaming_feature_store_spark.operators.profile import value_histogram

    const = spark.createDataFrame([(5.0,), (5.0,), (None,)], "v double")
    rows = value_histogram(const, "v", n_bins=4).orderBy("bin").collect()
    assert [r["cnt"] for r in rows] == [2, 0, 0, 0]
    assert len(rows) == 4
    # gappy data: bins between clusters exist with cnt=0
    gappy = spark.createDataFrame([(0.0,), (10.0,)], "v double")
    rows = value_histogram(gappy, "v", n_bins=5).orderBy("bin").collect()
    assert [r["cnt"] for r in rows] == [1, 0, 0, 0, 1]
    assert rows[0]["bin_lo"] == 0.0 and rows[-1]["bin_hi"] == 10.0


def test_winsorized_stats_clamps_tails(spark):
    from streaming_feature_store_spark.operators.profile import winsorized_stats

    vals = [float(i) for i in range(1, 101)]  # 1..100
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    r = winsorized_stats(df, "v", "g", lo=0.10, hi=0.90).collect()[0]
    # exact interpolated p10 of 1..100 = 10.9; p90 = 90.1
    assert abs(r["p_lo"] - 10.9) < 1e-6 and abs(r["p_hi"] - 90.1) < 1e-6
    assert r["n_clamped_low"] == 10 and r["n_clamped_high"] == 10
    # winsorized mean: clamp 1..10 -> 10.9, 91..100 -> 90.1
    expected = (10 * 10.9 + sum(range(11, 91)) + 10 * 90.1) / 100
    assert abs(r["winsorized_mean"] - round(expected, 6)) < 1e-6


def test_gini_known_answers(spark):
    from streaming_feature_store_spark.operators.profile import gini_by_group

    df = spark.createDataFrame(
        [("eq", i, 5.0) for i in range(4)]
        + [("uneq", 0, 0.0), ("uneq", 1, 0.0), ("uneq", 2, 0.0), ("uneq", 3, 10.0)]
        + [("single", 0, 3.0)],
        "g string, tb long, x double",
    )
    out = {r["g"]: r for r in gini_by_group(df, "x", "g", "tb").collect()}
    assert out["eq"]["gini"] == 0.0          # perfectly equal
    assert abs(out["uneq"]["gini"] - 0.75) < 1e-6  # all mass on one of 4
    assert "single" not in out               # below min_rows


def test_data_quality_report_counts_and_single_scan(spark):
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.operators.profile import (
        data_quality_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, None), (3, 200.0, "b"), (4, 0.0, "a")],
        "id long, v double, tag string",
    )
    out = {
        r["rule"]: r
        for r in data_quality_report(
            df,
            {
                "negative_v": F.col("v") < 0,
                "v_above_100": F.col("v") > 100,
                "null_tag": F.col("tag").isNull(),
                "never": F.lit(False),
            },
        ).collect()
    }
    assert out["negative_v"]["n_violations"] == 1
    assert out["v_above_100"]["n_violations"] == 1
    assert out["null_tag"]["n_violations"] == 1
    assert out["never"]["n_violations"] == 0
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["negative_v"]["violation_rate"] == 0.25
    # single-scan contract: every rule evaluates in ONE aggregate over
    # one source scan — no per-rule jobs
    plan = data_quality_report(
        df, {"a": F.col("v") < 0, "b": F.col("v") > 100}
    )._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1


def test_referential_violations_orphans(spark):
    from streaming_feature_store_spark.operators.profile import (
        referential_violations,
    )

    child = spark.createDataFrame(
        [(1,), (2,), (2,), (9,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = referential_violations(
        child, parent, {"fk": "pk"}, "orphan_fk"
    ).collect()[0]
    assert r["rule"] == "orphan_fk"
    assert r["n_rows"] == 4 and r["n_violations"] == 1
    assert r["violation_rate"] == 0.25


def test_split_violations_routes_and_tags(spark):
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.operators.profile import (
        split_violations,
    )

    df = spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, None), (3, 200.0, "b"), (4, 5.0, "a")],
        "id long, v double, tag string",
    )
    clean, bad = split_violations(
        df,
        {
            "negative_v": F.col("v") < 0,
            "v_above_100": F.col("v") > 100,
            "null_tag": F.col("tag").isNull(),
        },
    )
    assert {r["id"] for r in clean.collect()} == {1, 4}
    got = {r["id"]: sorted(r["violated_rules"]) for r in bad.collect()}
    assert got == {2: ["negative_v", "null_tag"], 3: ["v_above_100"]}
    # clean keeps the original schema exactly
    assert clean.columns == df.columns


def test_split_violations_rejects_collision_and_persists_once(spark):
    import pytest as _pytest
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.cacheutil import (
        release_cached_intermediates,
    )
    from streaming_feature_store_spark.operators.profile import (
        split_violations,
    )

    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    with _pytest.raises(ValueError, match="violated_rules"):
        split_violations(
            df.withColumn("violated_rules", F.array()),
            {"neg": F.col("v") < 0},
        )
    clean, bad = split_violations(
        df, {"neg": F.col("v") < 0}, persist=True
    )
    assert clean.count() == 1 and bad.count() == 0
    assert release_cached_intermediates() >= 1


def test_erasure_purge_and_audit_agree(spark):
    from streaming_feature_store_spark.operators.profile import (
        erasure_audit,
        erasure_purge,
    )

    facts = spark.createDataFrame(
        [(i, i % 5) for i in range(100)], "row_id long, uid long"
    )
    dim = spark.createDataFrame(
        [(k, f"u{k}") for k in range(5)], "uid long, name string"
    )
    # duplicate subject keys must not double-count
    subjects = spark.createDataFrame([(2,), (2,), (4,)], "uid long")

    purged = erasure_purge(facts, "uid", subjects, "uid")
    assert purged.count() == 60
    assert purged.filter("uid in (2, 4)").count() == 0

    audit = {
        r["table_name"]: r
        for r in erasure_audit(
            {"facts": (facts, "uid"), "dim": (dim, "uid")},
            subjects,
            "uid",
        ).collect()
    }
    assert audit["facts"]["rows_purged"] == 40
    assert audit["facts"]["rows_kept"] == purged.count()
    assert audit["dim"]["rows_purged"] == 2
    assert audit["facts"]["purge_pct"] == 0.4
