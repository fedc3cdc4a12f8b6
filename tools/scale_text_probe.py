"""Scale probe for the corpus-statistics operators: TF-IDF keywords,
unigram-LM NLL scoring, bigram PMI collocations and the column profiler at
100k documents (~15M tokens) — 20x the sf0.1 corpus.

Near-linear growth vs sf0.1 = the tf/vocab shuffle layout holds; the probe
prints per-op wall times for PERFORMANCE.md.

Usage: python tools/scale_text_probe.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def force(df):
    df.write.mode("overwrite").format("noop").save()


def synth_docs(spark, n: int, toks: int):
    """Word-soup docs over a zipf-ish ~8k-word vocabulary (cubed uniform
    hash → heavy head, long tail), deterministic in doc_id."""
    u = (F.abs(F.xxhash64(F.col("doc_id"), F.col("j"))) % 1000) / 1000.0
    idx = F.floor(u * u * u * 8000).cast("int")
    return (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.explode(F.sequence(F.lit(1), F.lit(toks))).alias("j"),
        )
        .select("doc_id", F.concat(F.lit("w"), idx.cast("string")).alias("w"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("w")).alias("text"))
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    toks = int(sys.argv[2]) if len(sys.argv) > 2 else 150

    from streaming_feature_store_spark.operators.profile import profile_columns
    from streaming_feature_store_spark.operators.text import (
        bigram_pmi,
        tfidf_top_terms,
        unigram_nll,
    )
    from streaming_feature_store_spark.session import get_spark

    spark = get_spark("scale-text-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synth_docs(spark, n, toks).persist()
    t0 = time.time()
    n_docs = docs.count()
    print(f"corpus: {n_docs} docs x {toks} tokens ({time.time()-t0:.1f}s to materialize)")

    for name, df in [
        ("tfidf_top3", tfidf_top_terms(docs, k=3)),
        ("unigram_nll", unigram_nll(docs)),
        ("bigram_pmi_top20", bigram_pmi(docs, min_count=20, k=20)),
        ("profile_columns", profile_columns(docs.select("doc_id", "text"))),
    ]:
        t0 = time.time()
        force(df)
        warm = time.time() - t0
        t0 = time.time()
        force(df)
        print(f"{name}: first {warm:.1f}s, warm {time.time()-t0:.1f}s")

    docs.unpersist()


if __name__ == "__main__":
    main()
