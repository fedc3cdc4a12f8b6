"""Point-in-time (as-of) join — training sets without label leakage.

Reference parity: Feast ``get_historical_features(entity_df, features)``
(feast/feature_utils.py:151-168) and the online/offline parity check
(feature_utils.py:170-232). Semantics: for each label row, take the latest
feature row with ``feature_ts <= label_ts`` for the same entity.

Implementation is the **union + last_value(ignore nulls)** pattern, NOT a
range join:

    tag feature rows (src=0) and label rows (src=1) → union →
    window partitionBy(entity) orderBy(ts, src, tiebreak) →
    last(feature_col, ignorenulls) over rows unbounded-preceding..current →
    keep label rows.

Why this is the 100 TB-safe plan: a naive ``l.ts >= r.ts`` theta-join
explodes to O(|labels|·|features per key|) intermediate rows before the
per-key top-1 filter; the union pattern is one shuffle + one sort, linear in
input size, and skew behaves like any other keyed sort. (Same pattern Flink's
temporal join and Delta's SCD-2 reads use internally.)

Ordering ``(ts, src, tiebreak)`` makes the join inclusive (feature at exactly
label_ts wins, matching Feast's ``<=``) and fully deterministic.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    labels: DataFrame,
    features: DataFrame,
    entity_col: str,
    label_ts_us: str,
    feature_ts_us: str,
    feature_cols: list[str],
    label_cols: list[str],
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Return one row per label row, enriched with the as-of-latest feature
    values (null when no feature row precedes the label).

    Both inputs must carry exact integer event-time micros (see
    ``windows.with_event_micros``); equality/ordering on integers avoids any
    FP ambiguity at boundaries.
    """
    f = features.select(
        F.col(entity_col),
        F.col(feature_ts_us).alias("_us"),
        F.lit(0).alias("_src"),
        F.col(tiebreak_col).alias("_tb"),
        *[F.col(c) for c in feature_cols],
        *[F.lit(None).cast(labels.schema[c].dataType).alias(c) for c in label_cols],
    )
    l = labels.select(
        F.col(entity_col),
        F.col(label_ts_us).alias("_us"),
        F.lit(1).alias("_src"),
        F.col(tiebreak_col).alias("_tb"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(c) for c in feature_cols],
        *[F.col(c) for c in label_cols],
    )
    u = f.unionByName(l)
    w = (
        Window.partitionBy(entity_col)
        .orderBy("_us", "_src", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(c, ignorenulls=True).over(w).alias(f"asof_{c}") for c in feature_cols
    ]
    return (
        u.select("*", *carried)
        .filter(F.col("_src") == 1)
        .select(
            F.col(entity_col),
            F.col("_us").alias("label_ts_us"),
            F.col("_tb").alias("label_key"),
            *[F.col(c) for c in label_cols],
            *[F.col(f"asof_{c}") for c in feature_cols],
        )
    )
