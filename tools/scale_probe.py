"""Scale probe: run the core operator families on generated data 20× the
bench size to observe scaling behavior (near-linear = the partition/shuffle
strategy holds; superlinear = a plan smell). Results land in PERFORMANCE.md.

Usage: python tools/scale_probe.py [n_events] [n_entities]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    entities = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from streaming_feature_store_spark.operators.asof import asof_join
    from streaming_feature_store_spark.operators.sessions import funnel_features
    from streaming_feature_store_spark.operators.windows import (
        multi_horizon_counts,
        sliding_stats,
        with_event_micros,
    )
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # events-shaped synthetic: ~23 days at ~1 event/second, heavy-ish skew on
    # low entity ids (zipf-ish via modulo of a squared hash)
    h = F.abs(F.xxhash64("id"))
    ev = (
        spark.range(n)
        .select(
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
        .persist()
    )
    print(f"events={ev.count():,} entities~{entities:,}")

    t0 = time.time(); force(sliding_stats(ev, "user_id"))
    t_slide = time.time() - t0
    print(f"sliding_stats(5m/1m): {t_slide:.2f}s  ({n/t_slide:,.0f} events/s)")

    t0 = time.time(); force(multi_horizon_counts(ev, "user_id"))
    print(f"multi_horizon (3 range frames): {time.time()-t0:.2f}s")

    t0 = time.time(); force(funnel_features(ev, "user_id"))
    print(f"sessionize+funnel: {time.time()-t0:.2f}s")

    evu = with_event_micros(ev)
    labels = evu.filter(F.col("event_type") == "purchase")
    feats = evu.filter(F.col("event_type") != "purchase").withColumnRenamed("value", "fval")
    t0 = time.time()
    force(
        asof_join(labels, feats, "user_id", "us", "us", ["fval"], [], "event_id")
    )
    print(f"asof_join ({labels.count():,} labels): {time.time()-t0:.2f}s")

    # ---- adversarial skew: zipf-ish (log-uniform) entity distribution ----
    # user = floor(entities^u), u ~ U[0,1): key frequency ~ 1/key, and the
    # hottest key alone carries ~ln(2)/ln(entities) of ALL rows (~6% at
    # 100k entities) — the worst realistic power-law hot key. Every scale
    # claim elsewhere assumes benign keys; this section checks the two
    # mitigations the repo actually ships: the salted two-phase aggregate
    # (operators/skew.salted_agg) and AQE's skew-join split.
    from streaming_feature_store_spark.operators.skew import salted_agg

    h2 = F.abs(F.xxhash64("event_id"))
    skew = ev.withColumn(
        "user_id",
        F.floor(
            F.pow(F.lit(float(entities)), (h2 % 1_000_000) / 1_000_000.0)
        ).cast("long"),
    ).persist()
    top = (
        skew.groupBy("user_id").count().orderBy(F.desc("count")).first()
    )
    print(
        f"skew frame: hottest key={top['user_id']} holds "
        f"{top['count']/n:.1%} of {n:,} rows"
    )
    aggs = {"n": ("count", "*"), "total": ("sum", "value"),
            "mx": ("max", "value")}

    t0 = time.time(); force(salted_agg(ev, "user_id", aggs))
    t_uni = time.time() - t0
    t0 = time.time(); force(salted_agg(skew, "user_id", aggs))
    t_skew = time.time() - t0
    t0 = time.time(); force(
        skew.groupBy("user_id").agg(
            F.count("*").alias("n"), F.sum("value").alias("total"),
            F.max("value").alias("mx"),
        )
    )
    t_plain = time.time() - t0
    print(
        f"salted_agg uniform: {t_uni:.2f}s  zipf: {t_skew:.2f}s "
        f"(x{t_skew/t_uni:.2f})  plain-groupBy zipf: {t_plain:.2f}s"
    )

    # AQE skew-join: sort-merge join of the zipf fact against a per-entity
    # dim with broadcast disabled (at 100 TB the dim side is NOT small, so
    # SMJ is the real plan); skewJoin.enabled splits the hot partition.
    dim = spark.range(entities).select(
        F.col("id").alias("user_id"),
        (F.abs(F.xxhash64("id")) % 100).alias("segment"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        t0 = time.time()
        force(
            skew.join(dim, "user_id")
            .groupBy("segment")
            .agg(F.count("*").alias("n"))
        )
        t_sj = time.time() - t0
        uni = ev.withColumn("user_id", h2 % entities)
        t0 = time.time()
        force(
            uni.join(dim, "user_id")
            .groupBy("segment")
            .agg(F.count("*").alias("n"))
        )
        t_uj = time.time() - t0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    print(
        f"AQE skew-join (SMJ, no broadcast): zipf {t_sj:.2f}s vs uniform "
        f"{t_uj:.2f}s (x{t_sj/t_uj:.2f})"
    )

    spark.stop()


if __name__ == "__main__":
    main()
