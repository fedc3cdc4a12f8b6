"""Drift-detection operators: PSI, two-sample KS, chi-square.

Reference parity: training/drift_check.py — KS per numeric feature
(drift_check.py:50-136), chi-square for categoricals (:85-97), PSI with
quantile buckets (:138-169), prediction-drift thresholds 0.1/0.2 (:171-209).

All three are expressed as pure DataFrame aggregations (no scipy, no UDF):

- **PSI**: fixed bucket edges → two bucket-count vectors → Σ(a−e)·ln(a/e).
  Fixed edges (not per-run quantiles) keep the metric deterministic and
  comparable across runs; at 100 TB the bucket counts are a map-side
  partial agg, one tiny shuffle.
- **KS**: D = max |F1(v) − F2(v)| over the pooled sample, via cumulative
  conditional counts over a value-ordered RANGE frame (ties handled by the
  frame, not row order). NOTE: this is a global sort on one key — fine for
  a per-feature drift metric; for very large inputs pre-bin values first
  (the reference caps its sample at 1000 keys for the same reason,
  drift_check.py:222-225).
- **chi-square**: contingency counts + expected = row·col/n, Σ(o−e)²/e.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def psi(
    df: DataFrame,
    value_col: str,
    group_col: str,
    edges: list[float],
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between group_col==false (expected) and
    ==true (actual) populations, over fixed bucket edges."""
    bucket = F.lit(0)
    for i, e in enumerate(edges):
        bucket = F.when(F.col(value_col) >= e, i + 1).otherwise(bucket)
    d = df.withColumn("_bucket", bucket)
    counts = d.groupBy("_bucket").agg(
        F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("n_expected"),
        F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("n_actual"),
    )
    tot = Window.partitionBy()
    frac_e = F.col("n_expected") / F.sum("n_expected").over(tot) + eps
    frac_a = F.col("n_actual") / F.sum("n_actual").over(tot) + eps
    per_bucket = counts.select(
        ((frac_a - frac_e) * F.log(frac_a / frac_e)).alias("term")
    )
    return per_bucket.agg(F.round(F.sum("term"), 6).alias("psi"))


def ks_statistic(df: DataFrame, value_col: str, group_col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic between the group_col
    true/false populations."""
    w = Window.orderBy(value_col).rangeBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    c1 = F.sum(F.when(F.col(group_col), 1).otherwise(0)).over(w)
    c2 = F.sum(F.when(~F.col(group_col), 1).otherwise(0)).over(w)
    n1 = F.sum(F.when(F.col(group_col), 1).otherwise(0)).over(tot)
    n2 = F.sum(F.when(~F.col(group_col), 1).otherwise(0)).over(tot)
    diff = F.abs(c1 / n1.cast("double") - c2 / n2.cast("double"))
    return (
        df.select(diff.alias("_d"))
        .agg(F.max("_d").alias("_ks"))
        .select(F.round(F.col("_ks"), 6).alias("ks_stat"))
    )


def chi_square(df: DataFrame, cat_col: str, group_col: str) -> DataFrame:
    """Chi-square statistic for the cat_col × group_col contingency table,
    plus degrees of freedom."""
    cells = df.groupBy(cat_col, group_col).agg(F.count("*").alias("o"))
    wr = Window.partitionBy(cat_col)
    wc = Window.partitionBy(group_col)
    tot = Window.partitionBy()
    e = (
        F.sum("o").over(wr)
        * F.sum("o").over(wc)
        / F.sum("o").over(tot).cast("double")
    )
    per_cell = cells.select(
        ((F.col("o") - e) * (F.col("o") - e) / e).alias("term"),
        F.col(cat_col).alias("_cat"),
        F.col(group_col).alias("_grp"),
    )
    return per_cell.agg(
        F.round(F.sum("term"), 6).alias("chi2"),
        (
            (F.countDistinct("_cat") - 1) * (F.countDistinct("_grp") - 1)
        ).alias("dof"),
    )


def ks_by_feature(df: DataFrame, cols: list[str], group_col: str) -> DataFrame:
    """Per-feature two-sample KS in ONE pass: unpivot the feature columns to
    (feature, value) rows, then the cumulative-CDF window runs PARTITIONED
    BY FEATURE — unlike single-column ``ks_statistic`` there is no global
    single-partition sort, so this scales to wide feature tables (the
    reference loops scipy per column — drift_check.py:50-136)."""
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (feature, value)", group_col
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    c1 = F.sum(F.when(F.col(group_col), 1).otherwise(0)).over(w)
    c2 = F.sum(F.when(~F.col(group_col), 1).otherwise(0)).over(w)
    n1 = F.sum(F.when(F.col(group_col), 1).otherwise(0)).over(tot)
    n2 = F.sum(F.when(~F.col(group_col), 1).otherwise(0)).over(tot)
    diff = F.abs(c1 / n1.cast("double") - c2 / n2.cast("double"))
    return (
        long.select("feature", diff.alias("_d"))
        .groupBy("feature")
        .agg(F.round(F.max("_d"), 6).alias("ks_stat"))
    )
