"""Feature-store façade: materialize, serve, train, validate, replay.

The reference splits these across Feast + Redis + ad-hoc scripts; here each
is a thin composition over the engine:

- ``materialize``     — build a feature view over raw events, write latest
                        view + log (batch twin of the streaming pipeline).
- ``get_online``      — point lookups against the latest view (J3,
                        inference/features.py:129-246).
- ``get_historical``  — PIT training frame via the as-of join (J4,
                        feast/feature_utils.py:151-168).
- ``parity_check``    — online/offline consistency validation
                        (feature_utils.py:170-232): the latest view must
                        equal the as-of snapshot of the log at `now`.
- ``replay``          — rebuild stores from the feature log (T11,
                        DesignDoc.md:129-131) — same code path as batch,
                        which is the point.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from streaming_feature_store_spark.operators.asof import asof_join
from streaming_feature_store_spark.registry import FeatureView
from streaming_feature_store_spark.streaming.sinks import append_log, upsert_latest


def materialize(
    spark: SparkSession,
    view: FeatureView,
    events: DataFrame,
    latest_path: str,
    log_path: str,
) -> DataFrame:
    feats = view.builder(events)
    upsert_latest(
        spark, feats, latest_path, [view.entity.join_key], view.timestamp_field
    )
    if view.timestamp_field == "window_start_s":
        append_log(feats, log_path, view.timestamp_field)
    else:
        feats.write.mode("append").parquet(log_path)
    return feats


def get_online(
    spark: SparkSession,
    latest_path: str,
    keys: DataFrame,
    join_key: str,
    ts_col: str | None = "window_start_s",
    now_s: int | None = None,
) -> DataFrame:
    """Point lookups against the latest view, with the serving contract's
    freshness column: ``freshness_s = now − feature_timestamp`` per row
    (inference/features.py:199-221 computes and gauges the same quantity).
    ``now_s`` pins the clock for tests/backfills; None = current time.
    ``ts_col=None`` skips the column for views without a timestamp."""
    from streaming_feature_store_spark.operators.enrich import point_lookup

    out = point_lookup(spark.read.parquet(latest_path), keys, join_key)
    if ts_col is not None and ts_col in out.columns:
        now = F.lit(now_s) if now_s is not None else F.unix_timestamp()
        out = out.withColumn(
            "freshness_s", (now - F.col(ts_col)).cast("long")
        )
    return out


def get_historical(
    labels: DataFrame,
    feature_log: DataFrame,
    join_key: str,
    label_ts_us: str,
    feature_ts_us: str,
    feature_cols: list[str],
    label_cols: list[str],
    tiebreak_col: str,
) -> DataFrame:
    """Point-in-time-correct training frame (no label leakage)."""
    return asof_join(
        labels,
        feature_log,
        join_key,
        label_ts_us,
        feature_ts_us,
        feature_cols,
        label_cols,
        tiebreak_col,
    )


def latest_from_log(log: DataFrame, join_key: str, ts_col: str) -> DataFrame:
    w = Window.partitionBy(join_key).orderBy(F.desc(ts_col))
    return log.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def parity_check(
    spark: SparkSession,
    latest_path: str,
    log_path: str,
    join_key: str,
    ts_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Online/offline parity: rows where the latest view disagrees with the
    newest log entry. Empty result = consistent stores."""
    online = spark.read.parquet(latest_path).select(join_key, ts_col, *compare_cols)
    offline = latest_from_log(spark.read.parquet(log_path), join_key, ts_col).select(
        join_key,
        F.col(ts_col).alias("_off_ts"),
        *[F.col(c).alias(f"_off_{c}") for c in compare_cols],
    )
    j = online.join(offline, join_key, "full")
    mism = F.lit(False)
    for c in compare_cols:
        mism = mism | ~(F.col(c).eqNullSafe(F.col(f"_off_{c}")))
    return j.filter(mism | ~F.col(ts_col).eqNullSafe(F.col("_off_ts")))


def replay(
    spark: SparkSession,
    log_path: str,
    latest_path: str,
    join_key: str,
    ts_col: str,
) -> None:
    """Rebuild the latest view purely from the feature log."""
    log = spark.read.parquet(log_path)
    rebuilt = latest_from_log(log, join_key, ts_col).drop("_date")
    upsert_latest(spark, rebuilt, latest_path, [join_key], ts_col)
