"""Replay/backfill throughput probe (T11): the FULL streaming pipeline —
file stream source → watermark → sliding-window features → foreachBatch
(latest-view upsert + effectively-once log append) — over a generated
historical backlog, end-to-end including all sink writes.

The reference's replay SLO is "1 h of data in < 10 min" at its 8 k/s design
rate ⇒ 48 k events/s (BASELINE.md). This probe measures two batch-sizing
policies:

- **streaming-shaped** (maxFilesPerTrigger=16, the live-tailing default):
  many micro-batches; each pays a latest-view bucket rewrite, so the
  sink cost is O(batches × touched buckets).
- **replay-shaped** (one availableNow batch over the whole backlog): the
  correct backfill mode — one stateful pass, one latest-view merge, one
  log partition.

Usage: python tools/replay_probe.py [n_events] [n_entities] [n_files]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def synth_events(spark, n: int, entities: int):
    h = F.abs(F.xxhash64("id"))
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (h % entities).alias("user_id"),
        F.timestamp_millis(
            F.lit(1_704_067_200_000) + F.col("id") + (h % 86_400_000)
        ).alias("ts"),
        F.round((h % 49_000) / 100.0 + 0.01, 2).alias("value"),
        F.element_at(
            F.array(*[F.lit(x) for x in ("view", "click", "purchase", "error", "signup")]),
            (h % 5 + 1).cast("int"),
        ).alias("event_type"),
    )


def run_pipeline(spark, src_dir: str, schema, out: Path, max_files: int | None):
    from streaming_feature_store_spark.streaming.pipeline import (
        start_feature_pipeline,
    )

    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("path", src_dir)
    )
    if max_files is not None:
        stream = stream.option("maxFilesPerTrigger", max_files)
    q = start_feature_pipeline(
        spark,
        stream.load(),
        latest_path=str(out / "latest"),
        log_path=str(out / "log"),
        checkpoint=str(out / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("replay-probe")
    spark.sparkContext.setLogLevel("ERROR")

    work = Path(tempfile.mkdtemp(prefix="replay_probe_"))
    src = str(work / "events")
    synth_events(spark, n, entities).repartition(n_files).write.parquet(src)
    schema = spark.read.parquet(src).schema
    print(f"events={n:,} entities~{entities:,} files={n_files}")

    for label, max_files in (("streaming-shaped (16 files/batch)", 16),
                             ("replay-shaped (single batch)", None)):
        out = work / label.split(" ")[0]
        t0 = time.time()
        run_pipeline(spark, src, schema, out, max_files)
        el = time.time() - t0
        print(f"{label}: {el:.1f}s  ({n/el:,.0f} events/s end-to-end)")
        shutil.rmtree(out, ignore_errors=True)

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
