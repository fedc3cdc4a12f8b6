"""Scale probe for the round-4 operators: interval join, weighted
priority sampling, linear interpolation, negative sampling, PageRank.

Synthetic data scaled well past the bench SF, to observe whether each
plan's cost tracks input size (the partition strategy holds) or blows up
(a hidden quadratic / single-partition smell). Rows land in
PERFORMANCE.md.

Usage: python tools/scale_new_ops_probe.py [n_events] [n_users] [n_items]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    users = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    items = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000_000

    from streaming_feature_store_spark.operators.curation import (
        negative_sample,
        weighted_priority_sample,
    )
    from streaming_feature_store_spark.operators.enrich import interval_join
    from streaming_feature_store_spark.operators.graph import pagerank
    from streaming_feature_store_spark.operators.windows import (
        interpolate_linear,
    )
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("scale-new-ops")
    spark.sparkContext.setLogLevel("ERROR")

    h = F.abs(F.xxhash64("id"))
    ev = (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            (h % users).alias("user_id"),
            F.timestamp_millis(
                F.lit(1_704_067_200_000) + F.col("id") + (h % 86_400_000)
            ).alias("ts"),
            F.round((h % 49_000) / 100.0 + 0.01, 2).alias("value"),
            F.when(h % 20 == 0, F.lit("purchase"))
            .otherwise(F.lit("view"))
            .alias("event_type"),
        )
        .persist()
    )
    print(f"events={ev.count():,} users={users:,}", flush=True)

    def probe(name, df):
        t0 = time.time()
        force(df)
        print(f"{name}: {time.time() - t0:.1f}s", flush=True)
        spark.catalog.clearCache()

    from streaming_feature_store_spark.operators.windows import (
        with_event_micros,
    )

    evu = with_event_micros(ev)
    spans = evu.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("span_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("start_us"),
        (F.col("us") + F.lit(3_600_000_000)).alias("end_us"),
    )
    probe(
        "interval_join 1h-after-purchase + agg",
        interval_join(
            evu.select("user_id", "event_id", "us", "value"),
            spans,
            "user_id",
            "span_user",
        )
        .groupBy("purchase_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s")),
    )

    probe(
        "weighted_priority_sample k=100 by type (md5, oracle form)",
        weighted_priority_sample(
            ev,
            100,
            F.col("value") + 1.0,
            id_col="event_id",
            strata_col="event_type",
        ),
    )

    probe(
        "weighted_priority_sample k=100 by type (xxhash64 fast path)",
        weighted_priority_sample(
            ev,
            100,
            F.col("value") + 1.0,
            id_col="event_id",
            strata_col="event_type",
            hash_fn="xxhash64",
        ),
    )

    sparse = evu.select(
        "user_id",
        "event_id",
        "us",
        F.when(F.col("event_id") % 3 == 0, F.col("value")).alias("reading"),
    )
    probe(
        "interpolate_linear",
        interpolate_linear(sparse, "user_id", "reading"),
    )

    inter = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", (F.abs(F.xxhash64("event_id")) % items).alias("item_id")
    )
    item_dim = spark.range(items).select(F.col("id").alias("item_id"))
    probe(
        f"negative_sample k=5 over {items:,} items",
        negative_sample(inter, item_dim, k=5),
    )

    # pagerank: power-law-ish follower graph, ~2M edges over 200k nodes
    edges = (
        spark.range(2_000_000)
        .select(
            (F.abs(F.xxhash64("id")) % 200_000).alias("src"),
            (F.abs(F.xxhash64(F.col("id") + 1)) % 1000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    probe("pagerank 5 iters, 2M edges / 200k nodes", pagerank(edges, iterations=5))

    spark.stop()


if __name__ == "__main__":
    main()
