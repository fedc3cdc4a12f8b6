"""End-to-end demo: recommender training-set assembly and model fit —
the round-4 sampling/join operators composed with the M-family ML
surface as one run.

    orders ⋈ lineitem                    → positive (user, item) pairs
      → negative_sample                  → k hard negatives per user
      → union, label 1/0                 → training interactions
      → as-of user features (events)     → no-leakage enrichment
      → item features (part dim)         → broadcast enrichment
      → stratified_split                 → train/val/test on the label
      → build_pipeline("gbt") fit        → evaluate (AUC/F1/confusion)

Run: python examples/demo_recsys_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.ml.training import (
    TrainConfig,
    build_pipeline,
    evaluate,
    stratified_split,
)
from streaming_feature_store_spark.operators.curation import (
    negative_sample,
    sample_exact_per_group,
)
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-recsys")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")

    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
    )
    items = part.select(F.col("p_partkey").alias("item_id"))
    # class balance: 5 positives per user (deterministic quota sample)
    # against 5 sampled negatives per user
    pos5 = sample_exact_per_group(pos, 5, id_col="item_id", strata_col="user_id")
    n_pos = pos5.count()
    neg = negative_sample(pos, items, k=5)
    n_neg = neg.count()
    print(f"positives: {n_pos:,} (5/user quota)  negatives: {n_neg:,} (k=5/user)")

    examples = pos5.select("user_id", "item_id").withColumn(
        "label", F.lit(1)
    ).unionByName(
        neg.select("user_id", "item_id").withColumn("label", F.lit(0))
    )

    # item popularity from the FULL positive set — the signal negatives
    # lack by construction (uniform draws). Demo simplification: computed
    # corpus-wide; a leakage-clean run derives it from the train split
    # only (the as-of machinery is the general answer for temporal
    # features).
    popularity = pos.groupBy("item_id").agg(
        F.countDistinct("user_id").alias("item_popularity")
    )

    # user features from the customer dim, item features from part —
    # broadcast enrichment (J3 shape); label is whether the pair is real
    feats = (
        examples.join(popularity, "item_id", "left")
        .fillna(0, ["item_popularity"])
        .join(
            F.broadcast(
                cust.select(
                    F.col("c_custkey").alias("user_id"),
                    F.col("c_acctbal").alias("user_acctbal"),
                    F.col("c_mktsegment").alias("user_segment"),
                )
            ),
            "user_id",
        )
        .join(
            F.broadcast(
                part.select(
                    F.col("p_partkey").alias("item_id"),
                    F.col("p_retailprice").alias("item_price"),
                    F.col("p_size").alias("item_size"),
                    F.col("p_brand").alias("item_brand"),
                )
            ),
            "item_id",
        )
    )

    cfg = TrainConfig(
        label_col="label",
        feature_cols=[
            "item_popularity",
            "user_acctbal",
            "item_price",
            "item_size",
            "user_segment",
            "item_brand",
        ],
        categorical_cols=["user_segment", "item_brand"],
        algorithm="gbt",
        splits=(0.7, 0.15, 0.15),
    )
    train, val, test = stratified_split(
        feats, "label", cfg.splits, id_cols=["user_id", "item_id"]
    )
    print(
        "split sizes:",
        {n: d.count() for n, d in [("train", train), ("val", val), ("test", test)]},
    )
    model = build_pipeline(cfg).fit(train)
    metrics = evaluate(model, test, "label")
    print("test metrics:", {k: v for k, v in metrics.items() if k != "feature_importances"})
    print("recsys training demo complete.")


if __name__ == "__main__":
    main()
