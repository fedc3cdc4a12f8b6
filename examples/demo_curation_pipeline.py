"""End-to-end demo: a training-data curation pipeline over the documents
and embeddings tables — the beyond-reference surface (BASELINE.json) as
one composed run.

    documents
      → data-quality gate (declarative constraint report — the
        admission check before any curation step trusts the snapshot)
      → PII redaction (regex gate)
      → exact dedup + near-dup pair detection (MinHash-LSH)
      → dedup clusters (exact connected components) → survivors
      → quality funnel report (length / stopword / repetition gates)
      → eval-set decontamination
      → per-source mixture sampling
      → context-window chunking (the model-input frame)
    embeddings
      → k-means centroids → cluster-balanced diversity sample
      → near-dup pairs in embedding space

Run: python examples/demo_curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.curation import (
    chunk_documents,
    cluster_balanced_sample,
    decontaminate,
    quality_funnel,
    sample_corpus,
)
from streaming_feature_store_spark.operators.dedup import (
    dedup_clusters,
    dedup_survivors,
    minhash_near_dups,
)
from streaming_feature_store_spark.operators.similarity import (
    embedding_near_dups,
    train_centroids,
)
from streaming_feature_store_spark.operators.text import redact_pii
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0:,} documents from {sf_dir}")

    # admission gate: one conditional-aggregate scan for the report, then
    # the ROUTING split (r7) — violating rows leave this pipeline through
    # quarantine with their violated_rules tags (e.g. zh docs route to a
    # separate non-latin pipeline) instead of being silently measured
    # and passed along
    from streaming_feature_store_spark.operators.profile import (
        data_quality_report,
        split_violations,
    )

    rules = {
        "null_text": F.col("text").isNull(),
        "empty_text": F.length(F.coalesce("text", F.lit(""))) == 0,
        "n_chars_mismatch": F.col("n_chars")
        != F.length(F.coalesce("text", F.lit(""))),
        # e.g. a latin-script-only training mix: zh routes to a
        # separate pipeline rather than this one
        "non_latin_lang": ~F.col("lang").isin("en", "de", "fr", "es"),
    }
    gate = data_quality_report(docs, rules).collect()
    print(
        "quality gate:",
        {r["rule"]: r["n_violations"] for r in gate},
    )
    admitted, quarantined = split_violations(docs, rules, persist=True)
    qdist = (
        quarantined.groupBy(
            F.array_join("violated_rules", ",").alias("rules")
        )
        .count()
        .orderBy("rules")
        .collect()
    )
    n_admitted = admitted.count()
    print(
        f"quarantine routing: {n_admitted:,} admitted, "
        f"{sum(r['count'] for r in qdist)} quarantined",
        {r["rules"]: r["count"] for r in qdist},
    )

    clean = redact_pii(admitted)

    pairs = minhash_near_dups(clean, threshold=0.5).persist()
    n_pairs = pairs.count()
    clusters = dedup_clusters(pairs)
    n_clusters = clusters.select("cluster_id").distinct().count()
    survivors = dedup_survivors(clean, pairs=pairs)
    n1 = survivors.count()
    print(
        f"dedup: {n_pairs} near-dup pairs -> {n_clusters} clusters; "
        f"{n_admitted - n1} docs dropped, {n1:,} survive"
    )

    print("quality funnel (per source, first 5):")
    for r in quality_funnel(survivors).orderBy("source").limit(5).collect():
        print(
            f"  {r['source']}: {r['n_docs']} -> len {r['n_len_ok']} -> "
            f"quality {r['n_quality']} -> clean {r['n_clean']} -> "
            f"unique {r['n_survivors']}"
        )

    train = survivors.filter(F.col("doc_id") % 5 != 0)
    ev = survivors.filter(F.col("doc_id") % 5 == 0)
    contaminated = decontaminate(train, ev, n=8).filter("is_contaminated")
    print(f"decontamination: {contaminated.count()} eval docs flagged")

    sampled = sample_corpus(
        train, rates={"src0": 1.0, "src1": 0.5}, default_rate=0.75
    )
    chunks = chunk_documents(sampled, chunk_size=32, stride=24)
    print(
        f"mixture: {sampled.count():,} docs sampled -> "
        f"{chunks.count():,} training chunks (32 tokens, stride 24)"
    )

    # token accounting with the TRAINED tokenizer (mixture weights and
    # packing budgets are set in subword tokens, not whitespace words)
    from streaming_feature_store_spark.operators.tokenize import (
        bpe_encode,
        train_bpe,
    )

    merges = train_bpe(sampled, n_merges=200, sample_docs=2000)
    budget = (
        bpe_encode(sampled, merges)
        .join(sampled.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("n_bpe_tokens").alias("bpe_tokens"))
        .orderBy(F.desc("bpe_tokens"))
        .limit(3)
        .collect()
    )
    print(
        "token budget (learned BPE, 200 merges, top sources):",
        {r["source"]: r["bpe_tokens"] for r in budget},
    )

    # round-7 mixture planning: tempered per-source rates and an exact
    # integer token-budget apportionment over the curated survivors
    from streaming_feature_store_spark.operators.curation import (
        largest_remainder_alloc,
        temperature_mixture_rates,
    )

    rates = temperature_mixture_rates(train, alpha=0.3)
    top_boost = rates.orderBy(F.desc("keep_rate")).limit(3).collect()
    print(
        "temperature mixture (alpha=0.3, most-retained sources):",
        {r["source"]: r["keep_rate"] for r in top_boost},
    )
    alloc = largest_remainder_alloc(
        rates.select("source", "n_tokens"), budget=100_000
    )
    total_alloc = alloc.agg(F.sum("alloc")).collect()[0][0]
    print(f"token budget apportionment: sum(alloc) == {total_alloc:,}")

    vecs = load_table(spark, sf_dir, "embeddings")
    cents = train_centroids(vecs, k=8)
    balanced = cluster_balanced_sample(vecs, k=8, per_cluster=20)
    emb_pairs = embedding_near_dups(vecs, dim=64, threshold=0.99)
    print(
        f"embeddings: {vecs.count():,} vectors, {cents.count()} trained "
        f"centroids, {balanced.count()} in the balanced sample, "
        f"{emb_pairs.count()} near-dup pairs at cosine>=0.99"
    )
    # semantic dedup on the trained clustering (GEMM kernel — scale path)
    from streaming_feature_store_spark.operators.similarity import (
        semantic_dedup,
    )

    sem = semantic_dedup(
        vecs, centroids=cents, threshold=0.95, kernel="arrow"
    )
    n_sem = sem.filter("dropped").count()
    print(f"SemDeDup (trained centroids, cosine>=0.95): {n_sem} dropped")
    from streaming_feature_store_spark.cacheutil import release_all

    release_all()  # the gate's tagged persist + any operator intermediates
    spark.stop()
    print("curation pipeline complete.")


if __name__ == "__main__":
    main()
