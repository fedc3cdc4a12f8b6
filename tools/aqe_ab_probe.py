"""A/B harness for the default AQE shuffle-sizing decision (round 7).

Round-6 finding: at sf1.0 the dedup/text family (q60/q67/q102) spills at
the static 32 shuffle partitions and recovers with
``initialPartitionNum = 4x``, but that factor was opt-in because at
sf0.1 it cost ~30% on the multi-consumer persisted queries (q101/q119):
a cached frame materializes at the PRE-coalesce partition count, so
every extra consumer pays 4x as many tiny-task rounds.

Hypothesis under test: Spark's
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true``
(SPARK-35332 family) lets AQE apply partition coalescing to cached-plan
output, which should eliminate the sf0.1 regression and make the 4x
headroom safe as the DEFAULT.

Usage: python tools/aqe_ab_probe.py <mode> <sf_dir> <reps> <query...>
  mode: stock | factor4 | factor4cache | cacheonly
(cacheonly = factor 1 + cached-plan coalescing, to attribute wins/regressions
between the two levers)
Prints one JSON line {"mode":..., "sf_dir":..., "queries": {name: min_sec}}.
Each invocation is one fresh JVM (AQE cache behavior is fixed at cache
time, so modes must not share a session).
"""

from __future__ import annotations

import json
import sys
import time

import pandas as pd

sys.path.insert(0, "/root/repo")


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main():
    mode, sf_dir, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    from streaming_feature_store_spark.plans.queries import QUERIES
    from streaming_feature_store_spark.session import get_spark

    # round 7 made factor4cache the session DEFAULT, so "stock" (the r6
    # baseline) must explicitly force both settings back off
    import os

    os.environ["SPARK_GRAFT_AQE_INITIAL_FACTOR"] = (
        "1" if mode in ("stock", "cacheonly") else "4"
    )
    configs = {}
    if mode == "stock":
        configs[
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
        ] = "false"
    if mode == "factor4":
        configs["spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"] = "false"
    spark = get_spark(f"aqe-ab-{mode}", configs=configs)
    spark.sparkContext.setLogLevel("ERROR")

    # same warmups as bench.py (JIT + parquet reader + python workers)
    force(spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) as s"))
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(np.asarray(v.to_numpy(), dtype=np.float64))

    force(spark.range(10_000).select(_warm(col("id").cast("double"))))

    times: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            t0 = time.time()
            force(QUERIES[name](spark, sf_dir))
            el = time.time() - t0
            times[name] = round(min(times.get(name, el), el), 3)
            spark.catalog.clearCache()
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "queries": times}))
    spark.stop()


if __name__ == "__main__":
    main()
