"""Empirical margins for oracling the sketch queries (q39/q40/q41/q45).

Checks, per SF dir:
- q39 (MinHash-LSH) pair set vs exact jaccard_pairs (q22's Spark twin,
  which hash-matches the DuckDB oracle) — must be identical for the oracle.
- SimHash Hamming distance distribution over the exact near-dup pairs —
  documents WHY the banded tier alone cannot carry recall (true pairs
  measure Hamming up to 11 ≫ the bands−1=7 guarantee; since round 3 the
  MinHash-banded backstop in simhash_near_dups closes that gap — recall
  asserted in tools/scale_dedup_probe.py).
- q41 (sign-LSH topk) vs exact cosine_topk (q25's Spark twin).
- HLL approx_count_distinct relative error per event_type.
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from streaming_feature_store_spark.operators.dedup import (
    jaccard_pairs,
    minhash_near_dups,
    simhash64,
)
from streaming_feature_store_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from streaming_feature_store_spark.sources.file import load_table


def main(sf_dir: str) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle_probe")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    docs = load_table(spark, sf_dir, "documents")

    exact = jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b", "jaccard")
    exact_set = {(r.doc_a, r.doc_b) for r in exact.collect()}
    print(f"exact jaccard>=0.5 pairs: {len(exact_set)}")

    mh = minhash_near_dups(docs, threshold=0.5).select("doc_a", "doc_b")
    mh_set = {(r.doc_a, r.doc_b) for r in mh.collect()}
    print(f"minhash pairs: {len(mh_set)}; missed={exact_set - mh_set}; extra={mh_set - exact_set}")

    sigs = simhash64(docs)
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
    ham = (
        exact.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
    )
    hs = sorted(r.hamming for r in ham.collect())
    print(f"simhash hamming over exact pairs: min={hs[0] if hs else None} max={hs[-1] if hs else None} all={hs}")
    # background: hamming of 200 random non-dup pairs
    rnd = (
        sigs.alias("x")
        .join(sigs.alias("y"), F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.bit_count(F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))).alias("h"))
        .limit(500)
    )
    rh = sorted(r.h for r in rnd.collect())
    print(f"background hamming: p5={rh[len(rh)//20]} median={rh[len(rh)//2]}")

    emb = load_table(spark, sf_dir, "embeddings")
    ex = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=3)
    ex_rows = {tuple(r) for r in ex.collect()}
    ap = lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), dim=64, k=3, bits=8)
    ap_rows = {tuple(r) for r in ap.collect()}
    print(f"cosine topk: exact={len(ex_rows)} lsh={len(ap_rows)} diff={len(ex_rows ^ ap_rows)}")
    if ex_rows != ap_rows:
        print("  missed:", sorted(ex_rows - ap_rows)[:5])
        print("  extra :", sorted(ap_rows - ex_rows)[:5])

    ev = load_table(spark, sf_dir, "events")
    errs = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("a"),
            F.countDistinct("user_id").alias("e"),
        )
        .select(F.abs(F.col("a") - F.col("e")) / F.col("e").cast("double"))
        .collect()
    )
    print(f"HLL rel errs: {sorted(round(r[0], 4) for r in errs)}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
