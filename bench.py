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

    # JVM/codegen warmup on a trivial plan so q01 doesn't absorb startup cost
    force(spark.range(1_000_000).selectExpr("sum(id) as s"))

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

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
