"""Round-9 second-batch scale probes: the new incremental-state family
at millions of rows — does the merge beat the daily full recompute it
replaces, and does it stay EXACT?

1. Incremental sessionization at ~4.3M events (30 days x 10k users):
   history sessionized once; then one day's delta merged via
   session_index_merge (closed sessions pass through; the <= 1 open
   session per entity gap-merges with the delta) vs re-sessionizing all
   31 days.  Asserts session-set parity at this scale.

2. Persisted histogram drift baseline at the same 4.3M + 144k delta:
   histogram_index_merge + psi_from_histograms (touches only the tiny
   index + the delta) vs the inline psi() full rescan of base ∪ delta.
   Asserts identical PSI to 6 dp.

3. Incremental distinct-cardinality at 4.3M events: distinct_index_merge
   of one day against the persisted (key, values) index vs the full
   COUNT DISTINCT recompute.  Asserts identical per-key counts.

4. Incremental clusters on a 2M-edge pair graph: cluster_index_merge of
   20k delta edges against the persisted label table vs full CC over
   2.02M edges.  Asserts identical labels.

Usage: python tools/scale_r9b_probe.py [n_users] [n_days]
Rows land in PERFORMANCE.md (round-9 section).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from streaming_feature_store_spark.session import get_spark


def timed(label: str, fn, reps: int = 2):
    """Steady-state timing: first run pays JVM/scan warmup, the REPORTED
    run is the second (the bench.py convention) — without this the probe
    ordering itself decides which path looks faster (the first psi probe
    misread 0.4x purely from cold-start)."""
    out = el = None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        el = time.time() - t0
    print(f"{label}: {el:.1f}s")
    return out, el


def synth_events(spark, n_users: int, n_days: int):
    """~n_users x n_days x 14 events; inter-event gaps 1-70 min so 30-min
    sessions split realistically (and some users' last events land
    within one gap of midnight, so day-boundary merges are exercised);
    value column long-tailed."""
    per_day = 14
    day = F.floor(F.col("id") / F.lit(n_users * per_day)).cast("long")
    slot = (F.floor(F.col("id") / F.lit(n_users)) % per_day).cast("long")
    gap_us = (F.abs(F.xxhash64("id")) % 6540 + 60) * F.lit(1_000_000)
    return spark.range(n_users * n_days * per_day).select(
        (F.col("id") % n_users).alias("user_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)  # 2024-01-01 UTC
            + day * F.lit(86_400_000_000)
            + slot * gap_us  # 13 x <=6600s = 23.8h: in-day, some near-midnight
        ).alias("ts"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 500 / 2.0).alias("value"),
    )


def main():
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    n_days = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("scale-r9b")
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_feature_store_spark.operators.dedup import (
        cluster_index_merge,
        dedup_clusters,
    )
    from streaming_feature_store_spark.operators.drift import (
        histogram_index,
        histogram_index_merge,
        psi,
        psi_from_histograms,
    )
    from streaming_feature_store_spark.operators.profile import (
        distinct_index_merge,
    )
    from streaming_feature_store_spark.operators.sessions import (
        session_index_merge,
        sessionize,
    )

    # deterministic, time-partitioned corpus: base = first n_days, delta
    # = one more day (the daily-ingest shape)
    base_days = n_days
    ev = synth_events(spark, n_users, base_days + 1)
    cut_us = 1704067200000000 + base_days * 86_400_000_000
    cut_str = "2024-01-%02d 00:00:00" % (base_days + 1)
    base = ev.filter(F.unix_micros("ts") < cut_us)
    delta = ev.filter(F.unix_micros("ts") >= cut_us)
    base.write.mode("overwrite").parquet("/tmp/r9b_base")
    delta.write.mode("overwrite").parquet("/tmp/r9b_delta")
    base = spark.read.parquet("/tmp/r9b_base")
    delta = spark.read.parquet("/tmp/r9b_delta")
    nb, nd = base.count(), delta.count()
    print(f"events: base={nb} delta={nd}")

    # --- 1. incremental sessionization -----------------------------------
    idx = sessionize(base, "user_id")
    idx.write.mode("overwrite").parquet("/tmp/r9b_sess_idx")
    idx = spark.read.parquet("/tmp/r9b_sess_idx")  # persisted production shape
    (m, t_merge) = timed(
        "sessions: index merge (1-day delta)",
        lambda: session_index_merge(
            delta, idx, cut_str, "user_id", validate=False
        ).count(),
    )
    (f, t_full) = timed(
        "sessions: full recompute (base+delta)",
        lambda: sessionize(base.unionByName(delta), "user_id").count(),
    )
    assert m == f, (m, f)
    merged = session_index_merge(delta, idx, cut_str, "user_id", validate=False)
    full = sessionize(base.unionByName(delta), "user_id")
    diff = merged.exceptAll(full).count() + full.exceptAll(merged).count()
    assert diff == 0, diff
    n_open = idx.filter(
        F.col("session_end_us") >= F.lit(cut_us - 1_800_000_000)
    ).count()
    n_idx = idx.count()
    print(f"sessions: EXACT ({m} sessions), speedup {t_full / t_merge:.1f}x; "
          f"rows touched: merge={n_idx}(index)+{nd}(delta) "
          f"[{n_open} open re-sessionized] vs full={nb + nd} events")

    # --- 2. persisted histogram drift baseline ----------------------------
    specs = {"value": [10.0, 25.0, 50.0, 100.0, 200.0]}
    hbase = histogram_index(base, specs)
    hbase.write.mode("overwrite").parquet("/tmp/r9b_hist_idx")
    hbase = spark.read.parquet("/tmp/r9b_hist_idx")

    def _psi_inc():
        hd = histogram_index(delta, specs)
        return psi_from_histograms(
            hbase, hd
        ).collect()[0]["psi"]

    (p_inc, t_inc) = timed("psi: vs persisted baseline (delta only)", _psi_inc)

    def _psi_full():
        both = base.withColumn("grp", F.lit(False)).unionByName(
            delta.withColumn("grp", F.lit(True))
        )
        return psi(both, "value", "grp", specs["value"]).collect()[0]["psi"]

    (p_full, t_full2) = timed("psi: inline full rescan", _psi_full)
    assert abs(p_inc - p_full) < 1e-9, (p_inc, p_full)
    print(f"psi: EXACT ({p_inc}), speedup {t_full2 / t_inc:.1f}x; "
          f"rows touched: merge={hbase.count()}(index)+{nd}(delta) "
          f"vs full={nb + nd} events")

    # --- 3. incremental distinct cardinality ------------------------------
    keyed = lambda d: d.select(
        (F.col("user_id") % 16).alias("k"),
        "user_id",
        F.hour("ts").alias("h"),
    )
    didx = keyed(base).distinct()
    didx.write.mode("overwrite").parquet("/tmp/r9b_dist_idx")
    didx = spark.read.parquet("/tmp/r9b_dist_idx")
    (rep, t_dinc) = timed(
        "distinct: index merge (delta)",
        lambda: {
            r["k"]: r["n_distinct"]
            for r in distinct_index_merge(
                keyed(delta), didx, ["k"], ["user_id", "h"]
            )[0].collect()
        },
    )
    (full_d, t_dfull) = timed(
        "distinct: full recompute",
        lambda: {
            r["k"]: r["c"]
            for r in keyed(base.unionByName(delta))
            .distinct()
            .groupBy("k")
            .agg(F.count("*").alias("c"))
            .collect()
        },
    )
    assert rep == full_d
    print(f"distinct: EXACT ({sum(rep.values())} cells), "
          f"speedup {t_dfull / t_dinc:.1f}x")

    # --- 4. incremental clusters ------------------------------------------
    n_edges = 2_000_000
    edges = spark.range(n_edges).select(
        (F.abs(F.xxhash64("id")) % 1_000_000).alias("doc_a"),
        (F.abs(F.xxhash64("id", F.lit(7))) % 1_000_000).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))
    dedges = spark.range(20_000).select(
        (F.abs(F.xxhash64("id", F.lit(13))) % 1_010_000).alias("doc_a"),
        (F.abs(F.xxhash64("id", F.lit(19))) % 1_010_000).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))
    edges.write.mode("overwrite").parquet("/tmp/r9b_edges")
    dedges.write.mode("overwrite").parquet("/tmp/r9b_dedges")
    edges = spark.read.parquet("/tmp/r9b_edges")
    dedges = spark.read.parquet("/tmp/r9b_dedges")
    labels = dedup_clusters(edges)
    labels.write.mode("overwrite").parquet("/tmp/r9b_labels")
    labels = spark.read.parquet("/tmp/r9b_labels")
    (mc, t_cinc) = timed(
        "clusters: index merge (20k delta edges)",
        lambda: cluster_index_merge(dedges, labels).count(),
    )
    (fc, t_cfull) = timed(
        "clusters: full CC recompute (2.02M edges)",
        lambda: dedup_clusters(edges.unionByName(dedges)).count(),
        reps=1,  # 47s of real distributed CC work; warmup noise is <5%
    )
    assert mc == fc, (mc, fc)
    mset = cluster_index_merge(dedges, labels)
    fset = dedup_clusters(edges.unionByName(dedges))
    cdiff = mset.exceptAll(fset).count() + fset.exceptAll(mset).count()
    assert cdiff == 0, cdiff
    print(f"clusters: EXACT ({mc} nodes), speedup {t_cfull / t_cinc:.1f}x")


if __name__ == "__main__":
    main()
