"""A/B probe: one-level sliding window (5 window-copies per EVENT) vs
two-level slide-pane form (pre-agg per 1-min bin, then 5 bin-copies per
BIN CELL) — guide §2.3 "aggregate before you shuffle".

Times both with the noop sink on sf0.1 and asserts row-identical output
(sorted collect compare) on sf0.01 + sf0.1.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.windows import sliding_stats
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def one_level(df, entity_col, ts_col="ts", value_col="value"):
    # the ORIGINAL window-generator form, inlined (ADVICE r12): after the
    # r12 merge sliding_stats IS the two-level pane form, so calling it
    # here would compare pane vs pane and mislabel the printed speedup
    from streaming_feature_store_spark.functions.exprs import dsum

    return (
        df.groupBy(
            F.col(entity_col), F.window(ts_col, "5 minutes", "1 minute").alias("w")
        )
        .agg(
            F.count("*").alias("event_count"),
            dsum(value_col).alias("value_sum"),
            F.max(value_col).alias("value_max"),
        )
        .withColumn("window_start_s", F.col("w.start").cast("long"))
        .drop("w")
    )


def two_level(df, entity_col, ts_col="ts", value_col="value"):
    # 5m window / 1m slide hard-wired for the probe
    binned = (
        df.groupBy(F.col(entity_col), F.window(ts_col, "1 minute").alias("b"))
        .agg(
            F.count("*").alias("_c"),
            F.sum(F.col(value_col).cast("decimal(18,4)")).alias("_s"),
            F.max(value_col).alias("_m"),
        )
        .select(
            entity_col,
            F.col("b.start").cast("long").alias("_bin_s"),
            "_c",
            "_s",
            "_m",
        )
    )
    exploded = binned.select(
        entity_col,
        "_c",
        "_s",
        "_m",
        "_bin_s",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("_k"),
    ).select(
        entity_col,
        "_c",
        "_s",
        "_m",
        (F.col("_bin_s") - 60 * F.col("_k")).alias("window_start_s"),
    )
    return exploded.groupBy(entity_col, "window_start_s").agg(
        F.sum("_c").alias("event_count"),
        F.sum("_s").cast("double").alias("value_sum"),
        F.max("_m").alias("value_max"),
    ).select(
        entity_col, "event_count", "value_sum", "value_max", "window_start_s"
    )


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    spark = get_spark("sliding-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warmups as in bench.py
    force(spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) s"))

    # correctness first
    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        ev = load_table(spark, sf, "events")
        # shipped sliding_stats (pane form post-r12) vs the inlined
        # generator form: the load-bearing row-identity check
        a = one_level(ev, "user_id")
        b = sliding_stats(ev, "user_id")
        assert a.columns == b.columns, (a.columns, b.columns)
        assert [f.dataType for f in a.schema] == [f.dataType for f in b.schema], (
            a.schema,
            b.schema,
        )
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, f"MISMATCH at {sf}: {len(ra)} vs {len(rb)} rows"
        print(f"{sf}: identical ({len(ra)} rows)")

    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    n = ev.count()
    print("events:", n)
    for name, fn in (("one_level", one_level), ("two_level", two_level)):
        ts = []
        for _ in range(6):
            t0 = time.time()
            force(fn(ev, "user_id"))
            ts.append(round(time.time() - t0, 3))
        print(name, "min", min(ts), ts, "ev/s @min", round(n / min(ts)))
    spark.stop()


if __name__ == "__main__":
    main()
