"""Benchmark harness: runs the headline query catalog at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full computation, no driver-side
collect/serialization cost) — the measured time is the distributed plan,
which is what scales."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from streaming_feature_store_spark.plans.queries import QUERIES
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup: decimal aggregation + window function + parquet
    # reader, so the first catalog query doesn't absorb compile cost
    force(
        spark.range(1_000_000).selectExpr(
            "sum(cast(id as decimal(18,4))) as s",
            "avg(id) as a",
        )
    )
    force(
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")).selectExpr(
            "count(*) as n"
        )
    )

    sf = None
    try:
        tail = os.path.basename(sf_dir.rstrip("/"))
        if tail.startswith("sf"):
            sf = float(tail[2:])
    except ValueError:
        pass

    times: dict[str, float] = {}
    for name, fn in QUERIES.items():
        t0 = time.time()
        force(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)

    # headline throughput: full sliding-window feature computation over the
    # events table (the reference's core workload — its simple engine does
    # ~10k events/s single-core, Flink ~100k events/s; BASELINE.md)
    from streaming_feature_store_spark.operators.windows import sliding_stats
    from streaming_feature_store_spark.sources.file import load_table

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    t0 = time.time()
    force(sliding_stats(ev, "user_id"))
    feat_s = time.time() - t0

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "feature_pipeline_events_per_s": round(n_events / feat_s, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
