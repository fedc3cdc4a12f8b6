"""Drift-detection operators: PSI, two-sample KS, chi-square — statistics,
p-values, and drift VERDICTS.

Reference parity: training/drift_check.py — KS per numeric feature
(drift_check.py:50-136), chi-square for categoricals (:85-97), severity
ladder on the p-value (:126-135), PSI with quantile buckets (:138-169),
prediction-drift monitor with 0.1/0.2 PSI thresholds (:171-209).

All expressed as pure DataFrame aggregations (no scipy, no UDF):

- **PSI**: fixed bucket edges → two bucket-count vectors → Σ(a−e)·ln(a/e).
  Fixed edges (not per-run quantiles) keep the metric deterministic and
  comparable across runs; at 100 TB the bucket counts are a map-side
  partial agg, one tiny shuffle.
- **KS**: D = max |F1(v) − F2(v)| over the pooled sample, via cumulative
  conditional counts over a value-ordered RANGE frame (ties handled by the
  frame, not row order). ``ks_statistic`` is the exact form (global sort —
  test-scale only); ``ks_binned`` is the scale path: pre-bin to fixed-width
  bins, CDF over the ~n_bins grouped rows.
- **chi-square**: contingency counts + expected = row·col/n, Σ(o−e)²/e.
- **p-values** (closed-form, so a SQL oracle can recompute them exactly):
  KS via the asymptotic Kolmogorov series 2·Σ(−1)^{k−1}·exp(−2k²λ²)
  (3 terms; λ = D·√(n1·n2/(n1+n2))), chi-square via the exact even-dof
  survival function exp(−x/2)·Σ_{i<dof/2}(x/2)^i/i!.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from streaming_feature_store_spark.cacheutil import persist_tracked

# M14 (reference sampling cap, drift_check.py): the exact-KS forms sort
# DISTINCT (feature, value) rows; this default bounds that sorted set
# STRUCTURALLY (VERDICT r3 advice #8) — callers can raise it explicitly,
# but can no longer run an unbounded single-partition sort by accident.
DEFAULT_MAX_EXACT_VALUES = 1_000_000


def _bounded_counts(counts: DataFrame, cap: int, what: str) -> DataFrame:
    """Persist + count the grouped distinct-value input and refuse past
    ``cap``, pointing at the binned twins. The persist is load-bearing
    anyway (the frame feeds the CDF window next); release via
    ``cacheutil.release_cached_intermediates()``."""
    c = persist_tracked(counts)
    n = c.count()
    if n > cap:
        c.unpersist()
        raise ValueError(
            f"{what}: {n} distinct value rows exceed max_exact_values="
            f"{cap}; use the binned form (ks_binned / ks_by_feature_binned)"
            " at this scale, or raise max_exact_values explicitly"
        )
    return c


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


def ks_statistic(
    df: DataFrame,
    value_col: str,
    group_col: str,
    max_exact_values: int = DEFAULT_MAX_EXACT_VALUES,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic between the group_col
    true/false populations. EXACT form: the empirical CDF only steps at
    distinct values, so the input is pre-aggregated to one (value, group
    counts) row — the remaining single-partition cumulative sort covers
    DISTINCT VALUES, not raw rows (the distributed groupBy does the heavy
    lifting). Fine at drift-sample scale and for discrete/low-cardinality
    features at any scale; for continuous features at table scale use
    ``ks_binned``, which bounds the sorted set at n_bins."""
    counts = _bounded_counts(
        df.groupBy(F.col(value_col).alias("_v")).agg(
            F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("_c2"),
        ),
        max_exact_values,
        "ks_statistic",
    )
    # values are distinct after the groupBy: a rows frame is the exact CDF
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    diff = F.abs(
        F.sum("_c1").over(w) / F.sum("_c1").over(tot).cast("double")
        - F.sum("_c2").over(w) / F.sum("_c2").over(tot).cast("double")
    )
    return (
        counts.select(diff.alias("_d"))
        .agg(F.max("_d").alias("_ks"))
        .select(F.round(F.col("_ks"), 6).alias("ks_stat"))
    )


def ks_binned(
    df: DataFrame, value_col: str, group_col: str, n_bins: int = 10_000
) -> DataFrame:
    """Two-sample KS at table scale: pre-bin values into ``n_bins``
    fixed-width bins over [min, max], then compute the CDFs over the BIN
    counts. The scan is a map-side grouped count (≤ n_bins rows shuffle);
    the cumulative window runs over ≤ n_bins rows — no global row sort
    anywhere, so this survives 100× where ``ks_statistic`` stalls.

    Accuracy: binning quantizes each CDF step to a bin boundary, so
    |D_binned − D_exact| ≤ max bin probability mass; with 10k bins on any
    sane distribution that is ≪ 0.01 (measured 0 on the test corpus —
    values land in distinct bins). min/max come from an exact first pass,
    keeping the result deterministic and SQL-reproducible."""
    lo, hi = df.agg(F.min(value_col), F.max(value_col)).first()
    width = (hi - lo) / n_bins if hi > lo else 1.0
    b = F.least(
        F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long"),
        F.lit(n_bins - 1),
    )
    counts = df.groupBy(b.alias("_bin")).agg(
        F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("_bin").rangeBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    diff = F.abs(
        F.sum("c1").over(w) / F.sum("c1").over(tot).cast("double")
        - F.sum("c2").over(w) / F.sum("c2").over(tot).cast("double")
    )
    return (
        counts.select(diff.alias("_d"))
        .agg(F.max("_d").alias("_ks"))
        .select(F.round(F.col("_ks"), 6).alias("ks_stat"))
    )


def _ks_pvalue(d: Column, n1: Column, n2: Column) -> Column:
    """Asymptotic two-sample KS p-value: λ = D·√(n1·n2/(n1+n2)),
    p = 2·Σ_{k≥1}(−1)^{k−1}·exp(−2k²λ²), truncated at 3 terms (the k=4 term
    is < 1e-28 for any λ where p < 0.999) and clamped to [0, 1]. Closed
    form — a DuckDB oracle recomputes it bit-for-bit."""
    lam2 = (d * d) * (n1 * n2 / (n1 + n2).cast("double"))
    series = (
        F.exp(-2.0 * lam2) - F.exp(-8.0 * lam2) + F.exp(-18.0 * lam2)
    )
    # defensive null guard: least/greatest SKIP nulls, so a NULL statistic
    # would clamp to p = 0.0 (spurious max significance) instead of NULL
    return F.when(
        d.isNotNull() & n1.isNotNull() & n2.isNotNull(),
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), 2.0 * series)),
    )


def drift_severity(p: Column, alpha: float = 0.05) -> Column:
    """Reference severity ladder (drift_check.py:126-135): none (p ≥ α),
    low (p ≥ α/10), medium (p ≥ α/100), high (below)."""
    return (
        F.when(p >= alpha, "none")
        .when(p >= alpha / 10, "low")
        .when(p >= alpha / 100, "medium")
        .otherwise("high")
    )


def ks_drift_report(
    df: DataFrame,
    cols: list[str],
    group_col: str,
    alpha: float = 0.05,
    max_exact_values: int = DEFAULT_MAX_EXACT_VALUES,
) -> DataFrame:
    """Per-feature KS DECISIONS, one pass: ks_by_feature's stacked
    grouped-count input extended with the asymptotic p-value, the
    is_drifted verdict (p < α) and the reference's severity ladder — the
    distributed form of detect_data_drift's per-feature loop
    (drift_check.py:50-136).

    r13 opt (guide §2.5 — a continuous feature's distinct values all
    land in ONE window partition): the cumulative CDF no longer runs as
    ``sum OVER (PARTITION BY feature ORDER BY value)`` — at sf0.1 that
    put l_extendedprice's ~450k distinct values in a single sort task,
    and at table scale the hot feature is a straggler/OOM.  Instead the
    prefix sums decompose exactly like ``behavior.distributed_prefix_agg``:
    range-partition on (feature, value) (parallel sort), run the window
    LOCALLY per (partition, feature), and lift with per-(partition,
    feature) exclusive offsets (a ≤ #partitions + #features row frame,
    broadcast).  The counts are exact longs, so the regrouped additions
    are order-insensitive and every per-row double (cum/n) — hence the
    per-feature max — is bit-identical to the single-sort form (pinned
    by test_ks_drift_report_matches_single_sort_form; q54 oracle
    unchanged).  ``ks_by_feature`` (q53, a bench control) deliberately
    keeps its original plan."""
    from streaming_feature_store_spark.cacheutil import (
        local_checkpoint_tracked,
    )

    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (feature, value)", group_col
    )
    # pre-aggregate to one (feature, value) row — exact (the CDF steps only
    # at distinct values) and the per-feature sort covers distinct values,
    # not raw rows (same plan shape as ks_by_feature)
    counts = _bounded_counts(
        long.groupBy("feature", "value").agg(
            F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("_c2"),
        ),
        max_exact_values,
        "ks_drift_report",
    )
    # parallel sort; the checkpoint pins partition ids between the offsets
    # job and the consumer (the distributed_prefix_agg contract)
    base = local_checkpoint_tracked(
        counts.repartitionByRange(F.col("feature"), F.col("value"))
        .withColumn("_pid", F.spark_partition_id())
    )
    wloc = (
        Window.partitionBy("_pid", "feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = base.withColumn("_l1", F.sum("_c1").over(wloc)).withColumn(
        "_l2", F.sum("_c2").over(wloc)
    )
    ptots = base.groupBy("_pid", "feature").agg(
        F.sum("_c1").alias("_p1"), F.sum("_c2").alias("_p2")
    )
    woff = (
        Window.partitionBy("feature")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = ptots.select(
        "_pid",
        "feature",
        F.sum("_p1").over(woff).alias("_o1"),
        F.sum("_p2").over(woff).alias("_o2"),
    )
    tots = ptots.groupBy("feature").agg(
        F.sum("_p1").alias("_n1"), F.sum("_p2").alias("_n2")
    )
    zero = F.lit(0).cast("long")
    cum1 = F.coalesce(F.col("_o1"), zero) + F.col("_l1")
    cum2 = F.coalesce(F.col("_o2"), zero) + F.col("_l2")
    diff = F.abs(
        cum1 / F.col("_n1").cast("double")
        - cum2 / F.col("_n2").cast("double")
    )
    per_feature = (
        local.join(F.broadcast(offs), ["_pid", "feature"])
        .join(F.broadcast(tots), "feature")
        .select(
            "feature", diff.alias("_d"), F.col("_n1"), F.col("_n2")
        )
        .groupBy("feature")
        .agg(
            F.max("_d").alias("_ks"),
            F.first("_n1").alias("_n1"),
            F.first("_n2").alias("_n2"),
        )
    )
    p = _ks_pvalue(F.col("_ks"), F.col("_n1"), F.col("_n2"))
    return per_feature.select(
        "feature",
        F.round(F.col("_ks"), 6).alias("ks_stat"),
        F.round(p, 6).alias("p_value"),
        (p < alpha).alias("is_drifted"),
        drift_severity(p, alpha).alias("severity"),
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


def _erfc(x: Column) -> Column:
    """Complementary error function as a codegen expression — the
    Abramowitz & Stegun 7.1.26 rational approximation (|err| < 1.5e-7,
    more than enough for a 6-dp p-value). Valid for x ≥ 0 (chi-square
    arguments always are)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return poly * F.exp(-x * x)


def chi2_sf(x: Column, dof: int) -> Column:
    """Chi-square survival function P(X > x) for any integer dof ≥ 1.

    Even dof = 2m is EXACT closed form (usable in SQL oracles):
    exp(−x/2)·Σ_{i=0}^{m−1}(x/2)^i/i!. Odd dof builds on
    Q(1/2, y) = erfc(√y) via the upward recurrence
    Q(s+1, y) = Q(s, y) + y^s·e^{−y}/Γ(s+1) (erfc approximated to 1.5e-7;
    use even-category contingencies when bit-exact oracle parity matters).
    """
    if dof < 1:
        raise ValueError(f"dof must be >= 1, got {dof}")
    y = x / 2.0
    if dof % 2 == 0:
        acc = F.lit(1.0)
        for i in range(1, dof // 2):
            acc = acc + (y ** i) / math.factorial(i)
        return F.exp(-y) * acc
    # odd dof: s walks 1/2, 3/2, ... up to dof/2
    q = _erfc(F.sqrt(y))
    s = 0.5
    while s < dof / 2.0 - 0.25:
        q = q + (y ** s) * F.exp(-y) / math.gamma(s + 1.0)
        s += 1.0
    # defensive null guard: least/greatest SKIP nulls (NULL x would clamp
    # to p = 0.0 instead of propagating NULL)
    return F.when(
        x.isNotNull(), F.least(F.lit(1.0), F.greatest(F.lit(0.0), q))
    )


def chi_square_report(
    df: DataFrame, cat_col: str, group_col: str, alpha: float = 0.05
) -> DataFrame:
    """Chi-square drift DECISION for a categorical feature: statistic, dof,
    p-value (exact for even dof, 1.5e-7-accurate erfc form for odd),
    is_drifted (p < α), severity — drift_check.py:84-97's scipy chisquare
    + the :126-135 ladder."""
    stats = chi_square(df, cat_col, group_col)
    dof = stats.select("dof").first()["dof"]
    p = chi2_sf(F.col("chi2"), dof)
    return stats.select(
        "chi2",
        "dof",
        F.round(p, 6).alias("p_value"),
        (p < alpha).alias("is_drifted"),
        drift_severity(p, alpha).alias("severity"),
    )


def prediction_drift(
    df: DataFrame,
    score_col: str,
    group_col: str,
    edges: list[float] | None = None,
    alpha: float = 0.05,
    max_exact_values: int = DEFAULT_MAX_EXACT_VALUES,
) -> DataFrame:
    """M13: the prediction-drift monitor (drift_check.py:171-209) as one
    DataFrame plan — PSI of the score distribution (historical=false vs
    recent=true) over fixed decile edges, exact KS + asymptotic p-value,
    the reference's PSI interpretation ladder (< 0.1 no_shift, < 0.2
    minor_shift, else major_shift), and the combined verdict
    drift_detected = PSI > 0.2 OR KS p < α. Emits one row with both means
    and sample counts, like the reference's results dict."""
    if edges is None:
        edges = [i / 10 for i in range(1, 10)]  # score deciles on [0, 1]
    psi_row = psi(df, score_col, group_col, edges)

    # grouped CDF input (exact; see ks_statistic) — per-population means
    # recovered from the grouped counts as Σ v·c / Σ c
    counts = _bounded_counts(
        df.groupBy(F.col(score_col).alias("_v")).agg(
            F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("_c2"),
        ),
        max_exact_values,
        "prediction_drift",
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    n1 = F.sum("_c1").over(tot)
    n2 = F.sum("_c2").over(tot)
    diff = F.abs(
        F.sum("_c1").over(w) / n1.cast("double")
        - F.sum("_c2").over(w) / n2.cast("double")
    )
    ks = (
        counts.select(
            diff.alias("_d"),
            n1.alias("_n1"),
            n2.alias("_n2"),
            (F.col("_v") * F.col("_c1")).alias("_vs1"),
            (F.col("_v") * F.col("_c2")).alias("_vs2"),
        )
        .agg(
            F.max("_d").alias("_ks"),
            F.first("_n1").alias("_n1"),
            F.first("_n2").alias("_n2"),
            (F.sum("_vs1") / F.first("_n1")).alias("_recent_mean"),
            (F.sum("_vs2") / F.first("_n2")).alias("_hist_mean"),
        )
    )
    p = _ks_pvalue(F.col("_ks"), F.col("_n1"), F.col("_n2"))
    ks_cols = ks.select(
        F.round(F.col("_ks"), 6).alias("ks_statistic"),
        F.round(p, 6).alias("ks_p_value"),
        (p < alpha).alias("_ks_drift"),
        F.col("_n1").alias("recent_samples"),
        F.col("_n2").alias("historical_samples"),
        F.round(F.col("_recent_mean"), 6).alias("recent_mean"),
        F.round(F.col("_hist_mean"), 6).alias("historical_mean"),
    )
    return psi_row.crossJoin(ks_cols).select(
        F.col("psi").alias("psi_score"),
        F.when(F.col("psi") < 0.1, "no_shift")
        .when(F.col("psi") < 0.2, "minor_shift")
        .otherwise("major_shift")
        .alias("psi_interpretation"),
        "ks_statistic",
        "ks_p_value",
        "recent_samples",
        "historical_samples",
        "recent_mean",
        "historical_mean",
        ((F.col("psi") > 0.2) | F.col("_ks_drift")).alias("drift_detected"),
    )


def ks_by_feature(
    df: DataFrame,
    cols: list[str],
    group_col: str,
    max_exact_values: int = DEFAULT_MAX_EXACT_VALUES,
) -> DataFrame:
    """Per-feature two-sample KS in ONE pass: unpivot the feature columns to
    (feature, value) rows, then the cumulative-CDF window runs PARTITIONED
    BY FEATURE — unlike single-column ``ks_statistic`` there is no global
    single-partition sort, so this scales to wide feature tables (the
    reference loops scipy per column — drift_check.py:50-136).

    The window input is pre-aggregated to one (feature, value) row with
    both group counts — EXACT, because an empirical CDF only steps at
    distinct values, and much smaller where features repeat (lineitem at
    sf0.1: 2.4M stacked rows → 583k grouped; the discrete features
    collapse 600k rows → ≤50). The remaining per-feature sort is bounded
    by the feature's distinct-value count; for continuous features at
    table scale use ``ks_by_feature_binned``, which bounds it at n_bins."""
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (feature, value)", group_col
    )
    counts = _bounded_counts(
        long.groupBy("feature", "value").agg(
            F.sum(F.when(F.col(group_col), 1).otherwise(0)).alias("_c1"),
            F.sum(F.when(~F.col(group_col), 1).otherwise(0)).alias("_c2"),
        ),
        max_exact_values,
        "ks_by_feature",
    )
    # values are distinct within a feature after the groupBy, so a rows
    # frame over the value sort is the exact CDF
    w = (
        Window.partitionBy("feature")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    diff = F.abs(
        F.sum("_c1").over(w) / F.sum("_c1").over(tot).cast("double")
        - F.sum("_c2").over(w) / F.sum("_c2").over(tot).cast("double")
    )
    return (
        counts.select("feature", diff.alias("_d"))
        .groupBy("feature")
        .agg(F.round(F.max("_d"), 6).alias("ks_stat"))
    )


def ks_by_feature_binned(
    df: DataFrame, cols: list[str], group_col: str, n_bins: int = 10_000
) -> DataFrame:
    """Per-feature pre-binned KS in one pass — the 100× form of
    ``ks_by_feature``: that function's CDF window sorts each feature's FULL
    row set inside one partition (fine for drift samples, a straggler at
    table scale); this one reduces each feature to ≤ ``n_bins`` grouped bin
    counts first, so the per-feature sort is over bins, not rows.

    Two scans: exact per-feature min/max (tiny agg), then a map-side
    grouped count keyed (feature, bin). Shuffle volume is O(features ·
    n_bins) regardless of row count. Accuracy bound as ``ks_binned``:
    |D_binned − D_exact| ≤ max per-bin probability mass."""
    stack_expr = ", ".join(f"'{c}', `{c}`" for c in cols)
    long = df.selectExpr(
        f"stack({len(cols)}, {stack_expr}) as (feature, value)", group_col
    )
    mm = long.groupBy("feature").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    width = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / n_bins
    ).otherwise(F.lit(1.0))
    binned = long.join(F.broadcast(mm), "feature").select(
        "feature",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(n_bins - 1),
        ).alias("_bin"),
        F.col(group_col).alias("_g"),
    )
    counts = binned.groupBy("feature", "_bin").agg(
        F.sum(F.when(F.col("_g"), 1).otherwise(0)).alias("c1"),
        F.sum(F.when(~F.col("_g"), 1).otherwise(0)).alias("c2"),
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("_bin")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    diff = F.abs(
        F.sum("c1").over(w) / F.sum("c1").over(tot).cast("double")
        - F.sum("c2").over(w) / F.sum("c2").over(tot).cast("double")
    )
    return (
        counts.select("feature", diff.alias("_d"))
        .groupBy("feature")
        .agg(F.round(F.max("_d"), 6).alias("ks_stat"))
    )


def cusum_changepoint(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str | None = None,
) -> DataFrame:
    """CUSUM change-point screen over a daily series — the classic
    level-shift detector that complements the distributional drift tests
    above (PSI/KS/chi² ask "did the distribution change"; CUSUM asks
    "WHEN did the level shift").  The daily metric is COUNT(*) or a
    decimal-exact SUM of ``value_col``; the cumulative sum of deviations
    from the series mean peaks at the change point.

    Output: one row per day with the daily metric, its deviation and the
    running CUSUM, plus ``is_peak`` marking the argmax of |CUSUM| (the
    estimated change point).  Plan: one day-grain aggregation (map-side
    partials), then a single-partition ordered window over the DAYS —
    bounded by the calendar (365 rows/year), never the events."""
    day = F.to_date(F.col(ts_col)).alias("day")
    if value_col is None:
        daily = df.groupBy(day).agg(F.count("*").cast("double").alias("m"))
    else:
        from streaming_feature_store_spark.functions.exprs import dsum

        daily = df.groupBy(day).agg(dsum(value_col).alias("m"))
    w_all = Window.partitionBy()
    w_run = Window.partitionBy().orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mean = F.avg("m").over(w_all)
    cusum = F.sum(F.col("m") - mean).over(w_run)
    # + 0.0 collapses IEEE negative zero (the exact-cancellation case at
    # the series end: sum of deviations == 0) so engines/partitionings
    # agree on the rendered value
    out = daily.select(
        "day",
        F.round("m", 6).alias("daily_metric"),
        (F.round(F.col("m") - mean, 6) + F.lit(0.0)).alias("deviation"),
        (F.round(cusum, 6) + F.lit(0.0)).alias("cusum"),
    )
    peak = F.max(F.abs(F.col("cusum"))).over(w_all)
    return out.withColumn("is_peak", F.abs(F.col("cusum")) == peak)


def seasonal_anomaly_counts(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    z: float = 3.0,
) -> DataFrame:
    """Seasonal-baseline anomaly screen: flag values far from their OWN
    (group, hour-of-day) population, then report per-cell anomaly rates.
    The hour-of-day baseline is the cheapest seasonality model that
    catches the classic monitoring failure — a global z-score (A11) calls
    every 3 a.m. lull an anomaly and misses a 3 a.m. spike.

    Exactness/scale: baseline = ONE map-side-combined aggregate over the
    ≤ |groups|·24-row cell key (Σx, Σx² as decimals — order-insensitive);
    the flag pass joins that tiny frame back by broadcast (zero extra
    shuffle on the fact) and compares in squared form,
    ``n(n−1)(x−μ)² > z²·n·var_num`` rearranged to avoid any division —
    identical integer/decimal-derived doubles in Spark and the oracle.
    """
    hour = F.hour(ts_col).alias("_hr")
    cells = df.select(
        F.col(group_col), hour, F.col(value_col).alias("_v")
    )
    base = cells.groupBy(group_col, "_hr").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("_v").cast("decimal(18,4)")).cast("double").alias("_s"),
        F.sum((F.col("_v") * F.col("_v")).cast("decimal(28,8)"))
        .cast("double")
        .alias("_s2"),
    )
    j = cells.join(F.broadcast(base), [group_col, "_hr"])
    n, s, s2, v = F.col("_n"), F.col("_s"), F.col("_s2"), F.col("_v")
    # (v − s/n)² > z²·(s2 − s²/n)/(n−1)  ⟺  (n·v − s)²·(n−1) > z²·n·(n·s2 − s²)
    lhs = (n * v - s) * (n * v - s) * (n - 1)
    rhs = F.lit(z * z) * n * (n * s2 - s * s)
    flagged = j.select(
        F.col(group_col), F.col("_hr"),
        F.when((n > 1) & (lhs > rhs), 1).otherwise(0).alias("_a"),
    )
    return flagged.groupBy(group_col, "_hr").agg(
        F.count("*").alias("n_events"),
        F.sum("_a").alias("n_anomalies"),
    ).select(
        F.col(group_col), F.col("_hr").alias("hour_of_day"),
        "n_events", "n_anomalies",
    )


_SQRT2 = 2.0 ** 0.5


def t_sf2(t_abs: Column, nu: Column) -> Column:
    """Two-sided Student-t tail P(|T_ν| > t) via Hill's normalizing
    transform (ACM Algorithm 395, CACM 13(10), 1970): map |t| with ν
    degrees of freedom to an equivalent normal deviate

        y = (ν − ½)·ln(1 + t²/ν),  b = 48·(ν − ½)²
        z = [(((−0.4y − 3.3)y − 24)y − 85.5)/(0.8y² + 100 + b) + y + 3)/b
             + 1]·√y

    then read p = erfc(z/√2).  Closed form (log/sqrt/polynomial only),
    so DuckDB oracles recompute it bit-for-bit — the property the exact
    incomplete-beta tail cannot offer in SQL.  Accuracy vs the exact t
    tail (validated numerically in tests/test_experiment_guards.py):
    |err| < 5e-4 at ν = 2, < 3e-6 at ν = 4, < 1e-8 for ν ≥ 8, degrading
    to ~3e-2 at ν = 1 (both arms n = 2 — below any credible readout).

    NULL-guarded (least/greatest SKIP nulls): NULL t or ν → NULL p,
    never a spurious clamp to 0.
    """
    y0 = t_abs * t_abs / nu
    ylog = F.when(y0 > 1e-6, F.log(F.lit(1.0) + y0)).otherwise(y0)
    a = nu - 0.5
    b = 48.0 * a * a
    y = a * ylog
    z = (
        ((((-0.4 * y - 3.3) * y - 24.0) * y - 85.5)
         / (0.8 * y * y + 100.0 + b) + y + 3.0) / b + 1.0
    ) * F.sqrt(y)
    return F.when(
        t_abs.isNotNull() & nu.isNotNull(),
        F.least(F.lit(1.0), F.greatest(F.lit(0.0), _erfc(z / _SQRT2))),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    variant_col: str,
    value_col: str,
    variant_a,
    variant_b,
    alpha_t: float = 1.96,
) -> DataFrame:
    """Per-group Welch's unequal-variance t-test between two variants —
    the A/B-experiment readout (does the treatment move the metric?) run
    for EVERY experiment/segment in one aggregation pass.

    Emits per group: both sample sizes and means, the Welch t statistic
    t = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b), the Welch–Satterthwaite
    effective degrees of freedom, the two-sided t p-value (:func:`t_sf2`,
    Hill's CACM-395 transform — exact for the df ranges that matter), and
    a significance flag at the given critical value (1.96 ≈ two-sided 5 %
    for large df).  All moments are conditional aggregates (one map-side-
    combined shuffle on the group key — no per-variant subqueries, no
    second pass); groups where either arm has < 2 observations yield NULL
    t/p (variance undefined).

    Moments follow the repo determinism policy: per-row decimal casts +
    exact decimal sums (Σx as decimal(18,4), Σx² as decimal(38,8)), with
    mean/variance derived from the merged moments — raw double
    AVG/VAR_SAMP would make the 4-dp t and the significance flag
    partial-order-dependent across partitionings, which is exactly the
    flakiness a pinned cross-engine parity artifact cannot tolerate.
    """
    a = F.col(variant_col) == F.lit(variant_a)
    b = F.col(variant_col) == F.lit(variant_b)
    v = F.col(value_col)
    out = df.groupBy(group_col).agg(
        F.count(F.when(a, v)).alias("n_a"),
        F.count(F.when(b, v)).alias("n_b"),
        F.sum(F.when(a, v).cast("decimal(18,4)"))
        .cast("double")
        .alias("_sa"),
        F.sum(F.when(b, v).cast("decimal(18,4)"))
        .cast("double")
        .alias("_sb"),
        F.sum(F.when(a, v * v).cast("decimal(38,8)"))
        .cast("double")
        .alias("_ssa"),
        F.sum(F.when(b, v * v).cast("decimal(38,8)"))
        .cast("double")
        .alias("_ssb"),
    )
    na, nb = F.col("n_a"), F.col("n_b")
    ma = F.col("_sa") / na
    mb = F.col("_sb") / nb
    va = F.when(
        na > 1, (F.col("_ssa") - F.col("_sa") * F.col("_sa") / na) / (na - 1)
    )
    vb = F.when(
        nb > 1, (F.col("_ssb") - F.col("_sb") * F.col("_sb") / nb) / (nb - 1)
    )
    # Intermediate PROJECTIONS (not inlined expressions): t_sf2 expands
    # its t/df arguments ~20x inside the Hill polynomial, so inlining the
    # full moment trees there multiplies the plan to tens of MB and costs
    # SECONDS of driver-side analysis per query (measured: q187
    # 0.33 -> 8.2 s at sf0.1 when inlined).  Catalyst's CollapseProject
    # leaves multi-use non-cheap aliases in place, so each level below
    # references small named columns.
    # se2 == 0.0 (both arms constant) must yield NULL t/df/p, not an
    # ANSI divide-by-zero job failure — a metric that is constant in a
    # thin segment is a fact of fleet-scale readouts, not an error
    m = out.select(
        group_col,
        "n_a",
        "n_b",
        ma.alias("_ma"),
        mb.alias("_mb"),
        F.when(va / na + vb / nb > 0, va / na + vb / nb).alias("_se2"),
        (va / na).alias("_van"),
        (vb / nb).alias("_vbn"),
    )
    se2 = F.col("_se2")
    t = (F.col("_ma") - F.col("_mb")) / F.sqrt(se2)
    dof = (se2 * se2) / (
        F.col("_van") ** 2 / (na - 1) + F.col("_vbn") ** 2 / (nb - 1)
    )
    s = m.select(
        group_col,
        "n_a",
        "n_b",
        "_ma",
        "_mb",
        t.alias("_t"),
        dof.alias("_dof"),
    )
    return s.select(
        group_col,
        "n_a",
        "n_b",
        F.round("_ma", 4).alias("mean_a"),
        F.round("_mb", 4).alias("mean_b"),
        F.round("_t", 4).alias("t_stat"),
        F.round("_dof", 2).alias("df_welch"),
        F.round(t_sf2(F.abs(F.col("_t")), F.col("_dof")), 6).alias(
            "p_value"
        ),
        (F.abs(F.col("_t")) > F.lit(alpha_t)).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Persisted drift-baseline histograms (round 9).
#
# Reference parity: training/drift_check.py recomputes the expected
# distribution from the full training frame on every check (:138-169).
# At 100 TB that rescan dominates the check; the production shape is a
# PERSISTED per-feature histogram over FIXED edges — counts are additive,
# so a daily delta merges with one tiny aggregate, and PSI against the
# baseline never touches history.  Same incremental-index pattern as
# dedup.build_minhash_index / similarity.save_ivf_index.


def histogram_index(df: DataFrame, specs: dict[str, list[float]]) -> DataFrame:
    """Build the persisted drift baseline: one ``(feature, bucket, n)`` row
    per feature x bucket over fixed edges.  Bucket b covers
    ``edges[b-1] <= v < edges[b]`` with open ends (b=0 below the first
    edge, b=len(edges) at/above the last) — the same ladder ``psi`` uses.
    NULLs are EXCLUDED (not bucket-0-coerced) so a feature going sparse
    shows up as a falling total, not a phantom low-bucket shift.

    Plan shape: ONE wide aggregate (sum-of-cases per feature x bucket,
    map-side combined — the q214 leakage-screen shape), then the one-row
    result unpivots driver-free into the tall index.  Zero-count buckets
    are kept: merged indexes stay union-compatible and a PSI term over an
    empty bucket is exactly 0.
    """
    aggs = []
    for feat, edges in specs.items():
        v = F.col(feat)
        for b in range(len(edges) + 1):
            if b == 0:
                cond = v < F.lit(edges[0])
            elif b == len(edges):
                cond = v >= F.lit(edges[-1])
            else:
                cond = (v >= F.lit(edges[b - 1])) & (v < F.lit(edges[b]))
            aggs.append(
                F.sum(
                    F.when(v.isNotNull() & cond, 1).otherwise(0)
                ).alias(f"__h_{feat}__{b}")
            )
    wide = df.agg(*aggs)
    cells = [
        F.struct(
            F.lit(feat).alias("feature"),
            F.lit(b).alias("bucket"),
            F.coalesce(F.col(f"__h_{feat}__{b}"), F.lit(0))
            .cast("long")
            .alias("n"),
        )
        for feat, edges in specs.items()
        for b in range(len(edges) + 1)
    ]
    return wide.select(F.explode(F.array(*cells)).alias("c")).select("c.*")


def histogram_index_merge(index: DataFrame, delta: DataFrame) -> DataFrame:
    """Merge a delta histogram into the persisted baseline — counts are
    additive, so the merge is a union + sum keyed by (feature, bucket).
    ``merge(index(base), index(delta)) == index(base UNION delta)``
    exactly (the oracled q225 guarantee); at 100 TB only the tiny index
    rows move, never the underlying data."""
    return (
        index.unionByName(delta)
        .groupBy("feature", "bucket")
        .agg(F.sum("n").alias("n"))
    )


def psi_from_histograms(
    expected: DataFrame, actual: DataFrame, eps: float = 1e-6
) -> DataFrame:
    """Per-feature PSI computed FROM two histogram indexes (baseline vs
    current window) — the scale path of ``psi``: history is never
    rescanned, the inputs are |features| x |buckets| rows.  Same closed
    form as ``psi`` (fraction + eps, sum (a-e)*ln(a/e)); a feature with
    an empty side reports NULL rather than an eps-artifact score.
    Full-outer join keyed on (feature, bucket) so a bucket seen by only
    one side still contributes its term."""
    e = expected.select(
        "feature", "bucket", F.col("n").alias("_ne")
    )
    a = actual.select("feature", "bucket", F.col("n").alias("_na"))
    j = e.join(a, ["feature", "bucket"], "full_outer").select(
        "feature",
        "bucket",
        F.coalesce("_ne", F.lit(0)).alias("_ne"),
        F.coalesce("_na", F.lit(0)).alias("_na"),
    )
    tot = Window.partitionBy("feature")
    te = F.sum("_ne").over(tot)
    ta = F.sum("_na").over(tot)
    frac_e = F.col("_ne") / F.when(te > 0, te).cast("double") + eps
    frac_a = F.col("_na") / F.when(ta > 0, ta).cast("double") + eps
    terms = j.select(
        "feature",
        "_ne",
        "_na",
        ((frac_a - frac_e) * F.log(frac_a / frac_e)).alias("_term"),
    )
    return terms.groupBy("feature").agg(
        F.round(F.sum("_term"), 6).alias("psi"),
        F.sum("_ne").alias("n_expected"),
        F.sum("_na").alias("n_actual"),
    )


def histogram_quantiles(
    index: DataFrame, specs: dict[str, list[float]], qs: list[float]
) -> DataFrame:
    """Deterministic quantile ESTIMATES from a persisted histogram index —
    linear interpolation within the straddling bucket, clamped to the
    edge value in the open end buckets.  The mergeable-summary answer to
    percentile monitoring at 100 TB: the sketch is the additive histogram
    (``histogram_index_merge``), and the estimate is a closed form over
    |features| x |buckets| rows, so a SQL oracle reproduces it bit-exactly
    (unlike KLL/GK sketches, whose estimates depend on merge order).

    For quantile q: target = q * total; the straddling bucket b is the
    first with cumulative count >= target (empty buckets cannot straddle);
    estimate = lo_b + (target - cum_before) / n_b * (hi_b - lo_b), where
    [lo_b, hi_b] are the bucket's edges (open ends clamp lo_0 = hi_0 =
    edges[0], lo_last = hi_last = edges[-1] — the histogram carries no
    range information beyond the ladder, and a pinned answer beats an
    extrapolated one for monitoring).
    """
    spark = index.sparkSession
    bounds = spark.createDataFrame(
        [
            (
                feat,
                b,
                float(edges[min(b, len(edges) - 1)] if b == 0 or b == len(edges)
                      else edges[b - 1]),
                float(edges[b] if b < len(edges) else edges[-1]),
            )
            for feat, edges in specs.items()
            for b in range(len(edges) + 1)
        ],
        "feature string, bucket int, lo double, hi double",
    )
    qf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    w = (
        Window.partitionBy("feature")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("feature")
    cum = (
        index.join(F.broadcast(bounds), ["feature", "bucket"])
        .select(
            "feature",
            "bucket",
            "lo",
            "hi",
            F.col("n").cast("double").alias("n"),
            F.sum("n").over(w).cast("double").alias("cum"),
            F.sum("n").over(tot).cast("double").alias("total"),
        )
    )
    tgt = F.col("q") * F.col("total")
    straddle = (
        cum.crossJoin(F.broadcast(qf))
        .filter((F.col("cum") >= tgt) & (F.col("cum") - F.col("n") < tgt))
        .filter(F.col("total") > 0)
    )
    est = F.col("lo") + (tgt - (F.col("cum") - F.col("n"))) / F.col("n") * (
        F.col("hi") - F.col("lo")
    )
    return straddle.select(
        "feature", "q", F.round(est, 6).alias("estimate")
    )


def quantile_edges(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    max_exact_values: int = DEFAULT_MAX_EXACT_VALUES,
) -> DataFrame:
    """Exact n-quantile bin edges: edge_i = the smallest value whose
    cumulative count reaches ceil(i·N / n_bins) (quantile_disc
    semantics), for i = 1..n_bins-1.  NULLs excluded.

    The integer target ceil(i·N/n_bins) = (i·N + n_bins−1) div n_bins is
    computed in INTEGER arithmetic — a float q·N flips its ceil() on
    1-ulp product noise (0.3·10000 = 3000.0000000000005), and frozen
    edges exist precisely to be reproducible.

    Plan: grouped distinct-value counts (the ``ks_statistic`` shape,
    bounded by ``max_exact_values`` — the single-partition cumulative
    sort covers DISTINCT values only), one cumulative window, one
    broadcast cross with the n_bins−1 targets, one min per target.
    Returns the tiny (i, edge) frame — persist it next to the model:
    these edges ARE the train/serve contract.
    """
    counts = _bounded_counts(
        df.filter(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("_v"))
        .agg(F.count("*").alias("_c")),
        max_exact_values,
        "quantile_edges",
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "_v",
        F.sum("_c").over(w).alias("_cum"),
        F.sum("_c").over(Window.partitionBy()).alias("_tot"),
    )
    spark = df.sparkSession
    targets = spark.createDataFrame(
        [(i,) for i in range(1, n_bins)], "i int"
    )
    return (
        cum.crossJoin(F.broadcast(targets))
        .filter(
            F.col("_cum")
            >= F.expr(f"(i * _tot + {n_bins - 1}) div {n_bins}")
        )
        .groupBy("i")
        .agg(F.min("_v").alias("edge"))
    )


def psi_quantile_binned(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over TRAIN-quantile-frozen buckets — the reference's actual
    PSI semantics (training/drift_check.py:138-169 buckets by the
    expected population's quantiles), restated with the edges as an
    explicit, persistable artifact: ``quantile_edges`` on the expected
    side (group_col false) freezes the ladder; both populations then
    bucket by it and the fixed-edge ``psi`` form prices the shift.
    The edge collect is BOUNDED at n_bins−1 rows (the frozen contract
    is meant to live driver-side / in a table next to the model)."""
    expected = df.filter(~F.col(group_col))
    edges = [
        float(r["edge"])
        for r in quantile_edges(expected, value_col, n_bins)
        .orderBy("i")
        .collect()
    ]
    return psi(df, value_col, group_col, edges, eps)
