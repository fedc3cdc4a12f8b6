"""End-to-end feature-freshness probe (VERDICT r5 "next" #6).

The reference's headline SLO is event -> online-feature freshness ~15 s
(reference README.md:139: "Feature freshness: ~15 seconds end-to-end").
This probe measures the same quantity on the engine's own serving path,
live — not replay:

  feeder thread: every ~1 s writes a parquet file of events whose ``ts``
  IS the wall clock at write time (ingest instant)
    -> read_file_stream (maxFilesPerTrigger tailing, 1 s trigger)
    -> windowed per-entity features + max(event ts) ride-along
    -> foreachBatch upsert_latest (the bucketed latest-view merge)
    -> sink records, per upserted row, visible_wall - last_event_ts

so each sample is the full event->queryable latency: file landing, source
discovery, micro-batch scheduling, windowed aggregation, and the
latest-view bucket rewrite. MetricsListener rides along for the
watermark-lag gauge and with_observation for in-plan row counts (T9).

Usage: python tools/freshness_probe.py [rounds] [events_per_round]
Prints p50/p95/max freshness for PERFORMANCE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    per_round = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from streaming_feature_store_spark.session import get_spark
    from streaming_feature_store_spark.streaming.pipeline import (
        read_file_stream,
    )
    from streaming_feature_store_spark.streaming.sinks import upsert_latest
    from streaming_feature_store_spark.streaming.watermarks import (
        MetricsListener,
        WatermarkPolicy,
    )

    root = tempfile.mkdtemp(prefix="freshness_probe_")
    src = os.path.join(root, "src")
    latest = os.path.join(root, "latest")
    ckpt = os.path.join(root, "ckpt")
    os.makedirs(src)

    spark = get_spark("freshness-probe")
    spark.sparkContext.setLogLevel("ERROR")
    listener = MetricsListener()
    spark.streams.addListener(listener)

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("event_type", StringType()),
        ]
    )

    stop_feed = threading.Event()

    def feed():
        rng = np.random.default_rng(7)
        for i in range(rounds):
            if stop_feed.is_set():
                return
            now_us = int(time.time() * 1_000_000)
            tbl = pa.table(
                {
                    "event_id": pa.array(
                        range(i * per_round, (i + 1) * per_round),
                        pa.int64(),
                    ),
                    "user_id": pa.array(
                        rng.integers(0, 50, per_round), pa.int64()
                    ),
                    "ts": pa.array(
                        [now_us] * per_round, pa.timestamp("us")
                    ),
                    "value": pa.array(
                        rng.uniform(1, 100, per_round), pa.float64()
                    ),
                    "event_type": pa.array(["view"] * per_round),
                }
            )
            # write-then-rename so the source never lists a partial file
            tmp = os.path.join(root, f"_tmp_{i}.parquet")
            pq.write_table(tbl, tmp)
            os.rename(tmp, os.path.join(src, f"batch_{i:05d}.parquet"))
            time.sleep(1.0)

    samples: list[float] = []
    lock = threading.Lock()

    events = read_file_stream(spark, src, schema, max_files_per_trigger=16)
    policy = WatermarkPolicy(max_out_of_orderness_s=2, allowed_lateness_s=0)
    feats = (
        policy.apply(events, "ts")
        .groupBy(
            F.col("user_id"),
            F.window("ts", "5 minutes", "1 minute").alias("w"),
        )
        .agg(
            F.count("*").alias("event_count"),
            F.sum("value").alias("value_sum"),
            F.max(F.unix_micros("ts")).alias("last_event_us"),
        )
        .withColumn("window_start_s", F.col("w.start").cast("long"))
        .drop("w")
    )
    # streaming form of the T9 ride-along: named observe (Observation
    # handles are batch-only); per-batch values surface in
    # QueryProgressEvent.observedMetrics via the listener
    feats = feats.observe("fresh", F.count(F.lit(1)).alias("n_rows"))

    def sink(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cached = batch_df.persist()
        try:
            upsert_latest(spark, cached, latest, ["user_id"])
            visible_us = time.time() * 1_000_000
            rows = cached.select("last_event_us").collect()
            with lock:
                samples.extend(
                    (visible_us - r["last_event_us"]) / 1e6 for r in rows
                )
        finally:
            cached.unpersist()

    q = (
        feats.writeStream.outputMode("update")
        .foreachBatch(sink)
        .queryName("freshness_probe")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )

    feeder = threading.Thread(target=feed, daemon=True)
    feeder.start()
    feeder.join()
    time.sleep(8)  # drain the tail
    q.stop()
    q.awaitTermination(30)
    spark.streams.removeListener(listener)

    with lock:
        arr = np.array(sorted(samples))
    assert len(arr) > 0, "no freshness samples collected"
    p50, p95 = np.percentile(arr, 50), np.percentile(arr, 95)
    print(
        f"freshness over {len(arr)} upserted rows "
        f"({rounds} rounds x {per_round} events): "
        f"p50 {p50:.2f}s  p95 {p95:.2f}s  max {arr.max():.2f}s"
    )
    lags = [
        p["freshness_lag_s"]
        for p in listener.progress
        if p.get("freshness_lag_s") is not None
    ]
    if lags:
        print(
            f"watermark-lag gauge (MetricsListener, {len(lags)} batches): "
            f"median {sorted(lags)[len(lags)//2]:.2f}s"
        )
    n_latest = spark.read.parquet(latest).count()
    print(f"latest view: {n_latest} entities queryable at stop")
    spark.stop()
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
