"""Round-6 scale probes for the two VERDICT r5 hardening items.

1. negative_sample at a 10^7-item dim: the dense-index join now carries
   no broadcast hint; this probe executes the op at a small control dim
   (AQE should pick BroadcastHashJoin — the index fits) and at a 10^7
   dim (AQE should pick a shuffled join — a forced broadcast here would
   ship ~10^7 rows to every executor), and prints which physical join
   the FINAL adaptive plan chose, read from the executed plan after the
   action.

2. source_overlap under deliberate boilerplate: every source shares an
   identical preamble (shingle document frequency == |sources|), the
   exact skewed-key scenario the r6 cap removes from the self-join.
   The probe prints how many (source, shingle) rows reach the cold
   self-join vs the full relation — bounded fan-out evidence — and
   cross-checks the capped result against the uncapped full self-join
   formula at this scale to prove the closed-form correction is exact.

Usage: python tools/scale_r6_probe.py [items_big] [n_sources] [docs_per_source]
Rows land in PERFORMANCE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def force(df):
    df.write.mode("overwrite").format("noop").save()


def chosen_joins(df) -> list[str]:
    """Execute ``df`` through its own QueryExecution (collect triggers
    it) and report every physical join line of the FINAL adaptive plan,
    with strategy and build side."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, "adaptive plan did not finalize"
    out = []
    for line in plan.splitlines():
        for k in (
            "BroadcastHashJoin",
            "ShuffledHashJoin",
            "SortMergeJoin",
            "BroadcastNestedLoopJoin",
        ):
            if k in line:
                side = "BuildLeft" if "BuildLeft" in line else (
                    "BuildRight" if "BuildRight" in line else "?"
                )
                keys = line.split(k, 1)[1][:40].strip()
                out.append(f"{k}/{side} {keys}")
    return out


def probe_negative_sample(spark, items_big: int):
    from streaming_feature_store_spark.operators.curation import (
        negative_sample,
    )

    # control: few users, small dim — AQE should broadcast something
    # tiny; big: 1M users x 10 draws vs a 10^7-row index — BOTH join
    # sides are large, so the unhinted index join must come out as a
    # shuffled join (pre-r6, the forced hint made it a broadcast of the
    # full index regardless).
    for label, users, n_inter, dim in (
        ("control 20k users / 1e5 items", 20_000, 200_000, 100_000),
        (f"big 1M users / {items_big:,} items", 1_000_000, 2_000_000, items_big),
    ):
        inter = (
            spark.range(n_inter)
            .select(
                (F.abs(F.xxhash64("id")) % users).alias("user_id"),
                (F.abs(F.xxhash64(F.col("id") + 7)) % 50_000).alias(
                    "item_id"
                ),
            )
            .persist()
        )
        inter.count()
        item_dim = spark.range(dim).select(F.col("id").alias("item_id"))
        t0 = time.time()
        joins = chosen_joins(negative_sample(inter, item_dim, k=5))
        dt = time.time() - t0
        print(f"negative_sample {label}: {dt:.1f}s", flush=True)
        for j in joins:
            print(f"    {j}", flush=True)
        inter.unpersist()


def probe_source_overlap(spark, n_sources: int, docs_per_source: int):
    from streaming_feature_store_spark.operators.dedup import _shingle_index
    from streaming_feature_store_spark.operators.text import source_overlap

    # Every document opens with the same legal boilerplate (df == G for
    # all its shingles across every source), followed by per-source body
    # text with partial cross-source sharing.
    boiler = " ".join(f"b{i}" for i in range(40))
    docs = (
        spark.range(n_sources * docs_per_source)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % n_sources).cast("string")).alias(
                "source"
            ),
            F.concat(
                F.lit(boiler + " "),
                F.concat_ws(
                    " ",
                    *[
                        F.concat(
                            F.lit("w"),
                            (
                                (F.abs(F.xxhash64(F.col("id"), F.lit(j))) % 500)
                                + (F.col("id") % n_sources) * 300
                            ).cast("string"),
                        )
                        for j in range(60)
                    ],
                ),
            ).alias("text"),
        )
        .persist()
    )
    docs.count()

    # Fan-out evidence: rows of the (source, shingle) relation that the
    # capped plan actually joins (df <= G-2) vs the full relation.
    sh = (
        _shingle_index(
            docs.select(F.col("source").alias("g"), "text"), "text", "g", 3
        )
        .select("g", F.col("sh").alias("s"))
        .distinct()
        .persist()
    )
    total = sh.count()
    dfreq = sh.groupBy("s").agg(F.count("*").alias("_df"))
    cold = (
        sh.join(dfreq, "s").filter(F.col("_df") <= n_sources - 2).count()
    )
    hot_keys = dfreq.filter(F.col("_df") >= n_sources - 1).count()
    print(
        f"source_overlap relation: {total:,} (source,shingle) rows; "
        f"cold join input {cold:,} rows; {hot_keys:,} hot shingles "
        f"(df>={n_sources-1}) exempted from the join",
        flush=True,
    )

    t0 = time.time()
    capped = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in source_overlap(docs, n=3).collect()
    }
    t_capped = time.time() - t0

    # Uncapped reference: the pre-r6 full self-join formula.
    a = sh.select(F.col("g").alias("source_a"), "s")
    b = sh.select(F.col("g").alias("source_b"), "s")
    sizes = sh.groupBy("g").agg(F.count("*").alias("nsh"))
    ref = {
        (r["source_a"], r["source_b"]): (r["n_common"], r["jaccard"])
        for r in (
            a.join(b, on="s")
            .filter(F.col("source_a") < F.col("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count("*").alias("n_common"))
            .join(
                sizes.select(
                    F.col("g").alias("source_a"), F.col("nsh").alias("_na")
                ),
                "source_a",
            )
            .join(
                sizes.select(
                    F.col("g").alias("source_b"), F.col("nsh").alias("_nb")
                ),
                "source_b",
            )
            .select(
                "source_a",
                "source_b",
                "n_common",
                F.round(
                    F.col("n_common")
                    / (
                        F.col("_na") + F.col("_nb") - F.col("n_common")
                    ).cast("double"),
                    6,
                ).alias("jaccard"),
            )
            .collect()
        )
    }
    assert capped == ref, (
        f"capped result diverges from uncapped reference: "
        f"{sorted(set(capped.items()) ^ set(ref.items()))[:5]}"
    )
    print(
        f"source_overlap capped == uncapped on {len(ref)} pairs "
        f"({n_sources} sources x {docs_per_source} docs, {t_capped:.1f}s)",
        flush=True,
    )
    sh.unpersist()
    docs.unpersist()


def main():
    items_big = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_sources = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    docs_per_source = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000

    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("scale-r6-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_negative_sample(spark, items_big)
    probe_source_overlap(spark, n_sources, docs_per_source)
    spark.stop()


if __name__ == "__main__":
    main()
