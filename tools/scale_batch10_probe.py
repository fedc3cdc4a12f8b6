"""Scale probe for the round-7 batch-9/10 operators at ~1e7 rows.

Synthesizes a 10M-row fact frame on the fly (seeded, distributed — no
driver materialization) and times each operator's full action, printing
one line per probe.  Results land in PERFORMANCE.md ("round-7 third
batch").

Run:  python tools/scale_batch10_probe.py [n_rows]
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from streaming_feature_store_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {out} ({dt:.1f}s)", flush=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark("scale-batch10", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # seeded synthetic fact frame: 10M rows, 1e6 users, 1000 segments
    base = (
        spark.range(0, n, 1, 64)
        .withColumn("user_id", F.xxhash64("id") % 1_000_000)
        .withColumn("seg", F.abs(F.xxhash64("id", F.lit(1))) % 1_000)
        .withColumn(
            "value",
            (F.abs(F.xxhash64("id", F.lit(2))) % 100_000) / 100.0,
        )
        .withColumn("trt", (F.col("user_id") % 2) == 1)
        .withColumn(
            "resp", (F.abs(F.xxhash64("id", F.lit(3))) % 10) < 3
        )
        .withColumn("shard", (F.col("id") % 365).cast("int"))
    )
    base.persist().count()

    from streaming_feature_store_spark.ml.training import (
        conformal_threshold,
    )
    from streaming_feature_store_spark.operators.enrich import band_join
    from streaming_feature_store_spark.operators.experiment import (
        bh_fdr,
        grouped_ztest,
        ratio_metric_delta,
        uplift_deciles,
    )
    from streaming_feature_store_spark.operators.incremental import (
        merge_partials,
        partial_aggregate,
    )
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    timed(
        f"grouped_ztest {n} rows x 1000 segments",
        lambda: grouped_ztest(base, ["seg"], "trt", "value").count(),
    )

    zt = grouped_ztest(base, ["seg"], "trt", "value")
    timed(
        "bh_fdr over 1000 hypotheses (post-agg frame)",
        lambda: bh_fdr(zt, "p_value", ["seg"]).count(),
    )

    timed(
        f"ratio_metric_delta {n} rows / 1e6 units x 1000 segs",
        lambda: ratio_metric_delta(
            base, "user_id", ["seg"], "value", F.lit(1.0)
        ).count(),
    )

    timed(
        f"conformal_threshold {n} rows x 1000 groups",
        lambda: conformal_threshold(
            base, "seg", "value", "id", alpha=0.1
        ).count(),
    )

    timed(
        f"incremental partial+merge {n} rows, 1000 groups x 365 shards",
        lambda: merge_partials(
            partial_aggregate(base, ["seg"], "shard", "value"), ["seg"]
        ).count(),
    )

    bands = (
        spark.range(0, 32)
        .select(
            F.col("id").alias("band_id"),
            (F.col("id") * 31.25).alias("lo"),
            ((F.col("id") + 1) * 31.25).alias("hi"),
        )
    )
    timed(
        f"band_join {n} rows x 32 bands (broadcast NLJ) + agg",
        lambda: band_join(base, "value", bands, "lo", "hi")
        .groupBy("band_id")
        .count()
        .count(),
    )

    timed(
        f"uplift_deciles {n} rows, 10 exact ntiles",
        lambda: uplift_deciles(
            base, "trt", "value", F.col("resp"), ["id"], n_buckets=10
        ).count(),
    )

    # ranking eval: 1e6 users x 10 candidate items
    pairs = (
        base.groupBy("seg", "user_id", (F.col("id") % 10).alias("item"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("score"),
            F.max(F.col("resp").cast("int")).alias("rel"),
        )
    )
    timed(
        "ranking_metrics ~1e6 users x ~10 items, k=5",
        lambda: ranking_metrics(
            pairs, ["seg"], "user_id", "item", "score", "rel", k=5
        ).count(),
    )

    spark.stop()


if __name__ == "__main__":
    main()
