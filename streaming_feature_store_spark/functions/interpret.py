"""Score/segment interpretation expressions (P13-P15).

Reference parity:
- P13 default-fill + NaN/inf sanitation (inference/features.py:405-460;
  defaults table inference/config.py:55-100) → ``fill_defaults``.
- P14 risk ladder: score ≥0.7 critical/block, ≥0.4 high/review,
  ≥0.15 medium/monitor, else low/allow (inference/models.py:493-540) +
  rule-gated risk factors → ``interpret_fraud``.
- P15 engagement segments (inference/models.py:543-575) → ``interpret_user``.

All chained when/otherwise — pure codegen expressions, usable identically in
batch scoring, streaming foreachBatch scoring, and SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

RISK_THRESHOLDS = (0.15, 0.4, 0.7)  # inference/models.py:497-508


def fill_defaults(df: DataFrame, defaults: dict[str, float | int | bool | str]) -> DataFrame:
    """Missing/NaN/±inf → declared default, per feature column."""
    out = df
    for c, d in defaults.items():
        if c not in df.columns:
            out = out.withColumn(c, F.lit(d))
            continue
        col = F.col(c)
        cleaned = col
        if isinstance(d, float):
            bad = col.isNull() | F.isnan(col) | (F.abs(col) == float("inf"))
            cleaned = F.when(bad, F.lit(d)).otherwise(col)
        else:
            cleaned = F.coalesce(col, F.lit(d))
        out = out.withColumn(c, cleaned)
    return out


def risk_level(score: Column) -> Column:
    lo, mid, hi = RISK_THRESHOLDS
    return (
        F.when(score >= hi, "critical")
        .when(score >= mid, "high")
        .when(score >= lo, "medium")
        .otherwise("low")
    )


def risk_action(score: Column) -> Column:
    lo, mid, hi = RISK_THRESHOLDS
    return (
        F.when(score >= hi, "block")
        .when(score >= mid, "review")
        .when(score >= lo, "monitor")
        .otherwise("allow")
    )


def interpret_fraud(df: DataFrame, score_col: str = "score") -> DataFrame:
    """P14: level/action ladder + rule-based risk-factor list (compacted to
    a comma-joined string so results stay hashable across engines)."""
    s = F.col(score_col)
    factors = F.array_compact(
        F.array(
            F.when(F.col("is_high_value"), F.lit("high_value")) if "is_high_value" in df.columns else F.lit(None).cast("string"),
            F.when(s >= 0.7, F.lit("model_critical")),
            F.when(s >= 0.4, F.lit("model_elevated")),
        )
    )
    return (
        df.withColumn("risk_level", risk_level(s))
        .withColumn("action", risk_action(s))
        .withColumn("risk_factors", F.array_join(factors, ","))
    )


def interpret_user(df: DataFrame, engagement_col: str = "engagement_score") -> DataFrame:
    """P15: engagement-threshold segmentation."""
    e = F.col(engagement_col)
    return df.withColumn(
        "segment",
        F.when(e >= 0.7, "power_user")
        .when(e >= 0.4, "engaged")
        .when(e >= 0.15, "casual")
        .otherwise("dormant"),
    ).withColumn("is_likely_purchaser", e >= 0.5)
