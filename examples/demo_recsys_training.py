"""End-to-end demo: recommender training-set assembly and model fit —
the round-4 sampling/join operators composed with the M-family ML
surface as one run.

    orders ⋈ lineitem                    → positive (user, item, ts) triples
      → negative_sample                  → k negatives per user (stamped at
                                           the user's latest interaction)
      → union, label 1/0                 → training interactions
      → daily popularity view + asof_join → item popularity AS OF each
                                           interaction (q144's chained-PIT
                                           pattern: a day's count is
                                           available from the following
                                           midnight — no future data, no
                                           self-counting of the label's
                                           own order)
      → user/item dims (customer, part)  → broadcast enrichment
      → stratified_split                 → train/val/test on the label
      → build_pipeline("gbt") fit        → evaluate (AUC/F1/confusion)

Run: python examples/demo_recsys_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import Window

from streaming_feature_store_spark.ml.training import (
    TrainConfig,
    build_pipeline,
    evaluate,
    stratified_split,
)
from streaming_feature_store_spark.operators.asof import asof_join
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

    # positive interactions carry their event time: the first order date
    # of each (user, item) pair — the timestamp every temporal feature
    # must respect
    pos_first = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
            F.to_date("o_orderdate").alias("day"),
        )
        .groupBy("user_id", "item_id")
        .agg(F.min("day").alias("day"))
    )
    pos = pos_first.select("user_id", "item_id")
    items = part.select(F.col("p_partkey").alias("item_id"))
    # class balance: 5 positives per user (deterministic quota sample)
    # against 5 sampled negatives per user
    pos5 = sample_exact_per_group(
        pos_first, 5, id_col="item_id", strata_col="user_id"
    )
    n_pos = pos5.count()
    neg = negative_sample(pos, items, k=5)
    n_neg = neg.count()
    print(f"positives: {n_pos:,} (5/user quota)  negatives: {n_neg:,} (k=5/user)")

    # negatives are stamped at the user's LATEST positive interaction —
    # the moment the contrast is drawn; their features must likewise be
    # what was knowable then
    user_cut = pos_first.groupBy("user_id").agg(F.max("day").alias("day"))
    examples = (
        pos5.select("user_id", "item_id", "day")
        .withColumn("label", F.lit(1))
        .unionByName(
            neg.select("user_id", "item_id")
            .join(user_cut, "user_id")
            .withColumn("label", F.lit(0))
        )
        .withColumn("us", F.unix_micros(F.col("day").cast("timestamp")))
    )

    # item popularity as a TEMPORAL feature view (q144's construction):
    # cumulative distinct purchasers per item by day, with each day's
    # snapshot available only from the following midnight. The as-of
    # backward join then gives every example the popularity that existed
    # at its interaction time — future orders (and the example's own
    # same-day order) can never leak in.
    # pos_first is already one row per (user, item) at its min day — the
    # per-user first-buy day — so daily new-purchaser counts aggregate it
    # directly (no second (item, user) re-agg shuffle)
    daily_new = pos_first.groupBy(
        "item_id", F.col("day").alias("first_day")
    ).agg(F.count("*").alias("new_users"))
    wpop = (
        Window.partitionBy("item_id")
        .orderBy("first_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pop_view = daily_new.select(
        "item_id",
        F.unix_micros(
            F.col("first_day").cast("timestamp") + F.expr("INTERVAL 1 DAY")
        ).alias("avail_us"),
        F.sum("new_users").over(wpop).alias("item_popularity"),
    )
    enriched = asof_join(
        examples.withColumn("tb", F.lit(0)),
        pop_view.withColumn("tb", F.lit(0)),
        "item_id",
        "us",
        "avail_us",
        ["item_popularity"],
        ["user_id", "label"],
        tiebreak_col="tb",
    ).select(
        "item_id",
        "user_id",
        "label",
        # an item never purchased before the interaction has popularity 0
        F.coalesce("asof_item_popularity", F.lit(0)).alias(
            "item_popularity"
        ),
    )

    # user features from the customer dim, item features from part —
    # broadcast enrichment (J3 shape); label is whether the pair is real
    feats = (
        enriched
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
