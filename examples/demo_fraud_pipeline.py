"""End-to-end demo: the reference's full fraud-detection lifecycle on Spark.

    synthetic transactions (S12)
      → event-time normalization (schemas)
      → sliding-window features (registry view, A1-A13)
      → materialize: latest view + feature log (S7 analog)
      → online point lookup (J3)
      → PIT training frame via as-of join (J4) — no label leakage
      → train GBT fraud model (M6), evaluate (M8)
      → batch score + risk interpretation (M15, P14)

Run: python examples/demo_fraud_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.functions.interpret import interpret_fraud
from streaming_feature_store_spark.ml.training import (
    TrainConfig,
    build_pipeline,
    evaluate,
    score,
    stratified_split,
)
from streaming_feature_store_spark.operators.windows import (
    multi_horizon_counts,
    with_event_micros,
)
from streaming_feature_store_spark.schemas import event_time
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.generators import (
    generate_devices,
    generate_transactions,
)
from streaming_feature_store_spark.store import get_historical, get_online, materialize
from streaming_feature_store_spark.registry import default_registry


def main() -> None:
    spark = get_spark("demo-fraud")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sfs_demo_")
    latest, log = os.path.join(work, "latest"), os.path.join(work, "log")

    # 1. events
    tx = event_time(generate_transactions(spark, 50_000, seed=42, fraud_rate=0.05))
    print(f"generated {tx.count()} transactions, fraud rate "
          f"{tx.agg(F.avg(F.col('is_fraud').cast('int'))).collect()[0][0]:.3f}")

    # 1b. impossible-travel geo screen (round 7): the generator plants
    # fraud teleports away from each card's home point; the haversine
    # speed flag over one per-card LAG window recovers them
    from streaming_feature_store_spark.operators.geo import impossible_travel

    geo = impossible_travel(
        tx.select("card_id", "ts", "txn_id", "geo_lat", "geo_lon",
                  "is_fraud"),
        "card_id", "ts", "geo_lat", "geo_lon", tiebreak_col="txn_id",
    )
    conf = geo.groupBy("is_fraud", "impossible_travel").count().collect()
    cm = {(r["is_fraud"], r["impossible_travel"]): r["count"] for r in conf}
    flag_fraud = cm.get((True, True), 0)
    flag_ok = cm.get((False, True), 0)
    print(
        f"impossible travel: {flag_fraud + flag_ok} flagged "
        f"({flag_fraud} fraud / {flag_ok} legit) — "
        f"precision {flag_fraud / max(flag_fraud + flag_ok, 1):.2f}"
    )

    # 2-3. features → store (entity = card)
    reg = default_registry()
    view = reg.views["transaction_stats_5m"]
    ev = tx.select(
        F.col("card_id").alias("user_id"), "ts", F.col("amount").alias("value"),
        F.col("mcc").alias("event_type"),
    )
    materialize(spark, view, ev, latest, log)
    print(f"latest view entities: {spark.read.parquet(latest).count()}")

    # 4. online lookup for 3 cards
    keys = ev.select("user_id").distinct().limit(3)
    print("online lookup:", get_online(spark, latest, keys, "user_id").collect())

    # 5. PIT training frame: per-transaction multi-horizon features as-of txn time
    feats = multi_horizon_counts(
        with_event_micros(tx).withColumnRenamed("txn_id", "event_id"),
        "card_id", value_col="amount",
    ).select("card_id", "us", "event_id", "cnt_5m", "sum_5m", "cnt_30m", "sum_30m")
    labels = with_event_micros(tx).select(
        "card_id", "us", F.col("txn_id").alias("event_id"), "amount",
        F.col("is_fraud").cast("int").alias("label"),
    )
    frame = get_historical(
        labels, feats, "card_id", "us", "us",
        ["cnt_5m", "sum_5m", "cnt_30m", "sum_30m"], ["amount", "label"], "event_id",
    ).na.fill(0)

    # 6. train + evaluate
    cfg = TrainConfig(
        feature_cols=["amount", "asof_cnt_5m", "asof_sum_5m", "asof_cnt_30m", "asof_sum_30m"],
        algorithm="gbt",
    )
    train, _, test = stratified_split(frame, "label")
    model = build_pipeline(cfg).fit(train)
    metrics = evaluate(model, test)
    print("metrics:", {k: round(v, 4) if isinstance(v, float) else v for k, v in metrics.items()})

    # 7. score + interpret
    scored = interpret_fraud(score(model, test))
    dist = scored.groupBy("risk_level", "action").count().orderBy("risk_level").collect()
    print("risk distribution:", [(r["risk_level"], r["action"], r["count"]) for r in dist])
    spark.stop()


if __name__ == "__main__":
    main()
