"""Time individual catalog queries in isolation with the noop sink.

Usage: python tools/qtime.py [--reps N] [--sf SF_DIR] query [query ...]

Same session config and warmup discipline as bench.py (decimal-agg +
parquet + Python-worker warmups, noop-sink action, clearCache between
reps) but runs ONLY the named queries — the isolation tool guide §1
prescribes for before/after comparisons, without a full catalog pass.
Prints per-rep seconds plus min/median, and one JSON line at the end.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as _pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    from pyspark.sql.functions import col as F_col, pandas_udf as _pudf

    from streaming_feature_store_spark.plans.queries import QUERIES
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")

    force(spark.range(1_000_000).selectExpr(
        "sum(cast(id as decimal(18,4))) as s", "avg(id) as a"))
    force(spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
          .selectExpr("count(*) as n"))

    @_pudf("double")
    def _warm(v: _pd.Series) -> _pd.Series:
        import numpy as _np
        return _pd.Series(_np.asarray(v.to_numpy(), dtype=_np.float64))

    force(spark.range(10_000).select(_warm(F_col("id").cast("double"))))

    out = {}
    for name in names:
        fn = QUERIES[name]
        rts = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            force(fn(spark, sf_dir))
            rts.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "reps": rts,
            "min": min(rts),
            "median": round(statistics.median(rts), 3),
        }
        print(f"{name}: min={min(rts)} median={out[name]['median']} {rts}",
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
