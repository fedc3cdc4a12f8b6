"""Drift-detection known-answer tests (training/drift_check.py semantics):
identical distributions → ~0 drift; disjoint distributions → maximal KS."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.drift import chi_square, ks_statistic, psi


def test_psi_identical_is_zero(spark):
    # both halves contain each value 0..99 exactly five times
    df = spark.range(1000).select(
        (F.col("id") % 100).cast("double").alias("value"),
        (F.col("id") < 500).alias("grp"),
    )
    assert abs(psi(df, "value", "grp", edges=[25.0, 50.0, 75.0]).collect()[0]["psi"]) < 1e-9


def test_ks_disjoint_is_one(spark):
    df = spark.range(200).select(
        F.when(F.col("id") < 100, F.col("id"))
        .otherwise(F.col("id") + 1000)
        .cast("double")
        .alias("value"),
        (F.col("id") < 100).alias("grp"),
    )
    assert ks_statistic(df, "value", "grp").collect()[0]["ks_stat"] == 1.0


def test_chi2_independent_is_small(spark):
    # perfectly balanced contingency → chi2 == 0
    df = spark.range(400).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("cat"),
        (F.col("id") % 4 < 2).alias("grp"),
    )
    r = chi_square(df, "cat", "grp").collect()[0]
    assert r["chi2"] == 0.0
    assert r["dof"] == 1
