"""Super-linearity probe for ranking_metrics (r7 verdict item #6).

The r7 1e6-user probe measured 102 s (sort-dominated). This probe holds
candidates-per-user fixed (10) and scales the user count 1e6 -> 1e7
(1e7 -> 1e8 pair rows), printing per-size wall time and the implied
scaling factor.  Decision rule from the verdict: optimize (pre-aggregate
per-user arrays via collect_list + one Arrow kernel pass, removing one
of the two window sorts) ONLY if time(10x) / time(1x) > 15 (1.5x
super-linear); otherwise record the row in PERFORMANCE.md and leave the
exact two-window plan alone.

Run:  python tools/ranking_scale_probe.py [sizes_csv]   (default 1000000,10000000)
"""

from __future__ import annotations

import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from streaming_feature_store_spark.session import get_spark  # noqa: E402


def pairs_frame(spark, n_users: int, items_per_user: int = 10):
    """Seeded synthetic (seg, user, item, score, rel) pairs, distributed."""
    n = n_users * items_per_user
    return (
        spark.range(0, n, 1, 128)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            (F.col("id") / n_users).cast("long").alias("item"),
            (F.abs(F.xxhash64("id")) % 1_000).alias("seg_raw"),
            ((F.abs(F.xxhash64("id", F.lit(1))) % 1_000_000) / 1e6).alias(
                "score"
            ),
            (F.abs(F.xxhash64("id", F.lit(2))) % 5 == 0).cast("int").alias(
                "rel"
            ),
        )
        .withColumn("seg", F.col("user_id") % 100)
        .drop("seg_raw")
    )


def main():
    sizes = [
        int(s)
        for s in (
            sys.argv[1] if len(sys.argv) > 1 else "1000000,10000000"
        ).split(",")
    ]
    spark = get_spark("ranking-probe", shuffle_partitions=128)
    spark.sparkContext.setLogLevel("ERROR")
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    results = {}
    for n_users in sizes:
        df = pairs_frame(spark, n_users)
        t0 = time.time()
        out = ranking_metrics(
            df, ["seg"], "user_id", "item", "score", "rel", k=5
        ).count()
        el = time.time() - t0
        results[n_users] = el
        print(f"ranking_metrics users={n_users:,} (x10 items): "
              f"{out} groups in {el:.1f}s", flush=True)
    if len(sizes) >= 2:
        lo, hi = sizes[0], sizes[-1]
        factor = results[hi] / results[lo]
        data_factor = hi / lo
        print(
            f"scaling: {data_factor:.0f}x data -> {factor:.1f}x time "
            f"({'SUPER-linear, optimize' if factor > 1.5 * data_factor else 'within the 1.5x-linear budget, leave the exact plan'})",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
