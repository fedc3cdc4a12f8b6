"""Composed incremental-ingest pipeline — the DAILY path of a 100 TB
training-data platform, built from round-9 operators: all corpus-scale
state (dedup index, ANN index, tokenizer) is built ONCE and persisted;
each day's delta prices on the DELTA.

Day 0 (one-time, amortized):
  1. build + persist the MinHash dedup index     (dedup.build_minhash_index)
  2. build + persist the IVF ANN index           (similarity.save_ivf_index)
  3. train + persist the BPE merge table         (tokenize.train_bpe/save_bpe)

Day 1..N (the recurring path — never re-shingles / re-assigns / re-trains):
  4. incremental near-dup screen: delta vs index (dedup.minhash_index_merge)
  5. drop delta docs that duplicate the corpus; upsert survivors' index
  6. tokenize survivors with the SAVED merges    (tokenize.bpe_encode)
  7. ANN retrieval of each survivor's nearest corpus neighbors against the
     PERSISTED index (similarity.ivf_topk_persisted) — the semantic-dedup /
     retrieval-eval hot loop

Run:  python examples/demo_incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from streaming_feature_store_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-ingest-demo")
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_feature_store_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_screen,
    )
    from streaming_feature_store_spark.operators.similarity import (
        ivf_topk_persisted,
        save_ivf_index,
    )
    from streaming_feature_store_spark.operators.tokenize import (
        bpe_encode,
        load_bpe,
        save_bpe,
        train_bpe,
    )
    from streaming_feature_store_spark.sources.file import load_table

    tmp = tempfile.mkdtemp(prefix="ingest_demo_")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = docs.filter(F.col("doc_id") % 10 != 0)      # the existing corpus
    delta = docs.filter(F.col("doc_id") % 10 == 0)     # today's crawl

    print("== day 0: build persistent corpus state (one-time) ==")
    build_minhash_index(base).write.mode("overwrite").parquet(f"{tmp}/mhidx")
    n_idx = spark.read.parquet(f"{tmp}/mhidx").count()
    print(f"  dedup index: {n_idx} docs indexed -> {tmp}/mhidx")
    save_ivf_index(emb, f"{tmp}/ivf", nlist=16)
    print(f"  ANN index:   16 cells persisted  -> {tmp}/ivf")
    merges = train_bpe(base, n_merges=60, sample_docs=None)
    save_bpe(merges, f"{tmp}/bpe.json")
    print(f"  tokenizer:   {len(merges)} BPE merges -> {tmp}/bpe.json")
    from streaming_feature_store_spark.operators.text import (
        bigram_lm_from_index,
        corpus_stats_index,
        corpus_stats_index_merge,
    )

    corpus_stats_index(base).write.mode("overwrite").parquet(f"{tmp}/stats")
    print(f"  text stats:  DF/unigram/bigram count index -> {tmp}/stats")

    print("== day 1: incremental ingest of the delta ==")
    idx = spark.read.parquet(f"{tmp}/mhidx")
    n_delta = delta.count()
    screen, updated = minhash_index_screen(delta, idx, threshold=0.5)
    # the documented gate policy: drop if the match is already indexed,
    # else keep the lowest-id member of an in-batch-only cluster
    keep = screen.filter(
        ~F.col("is_near_dup")
        | (~F.col("match_in_index") & (F.col("best_match_id") > F.col("doc_id")))
    ).select("doc_id")
    n_dup = n_delta - keep.count()
    print(f"  delta: {n_delta} docs; flagged duplicate by the gate: {n_dup}")
    survivors = delta.join(keep, "doc_id", "left_semi")
    n_surv = survivors.count()
    updated.write.mode("overwrite").parquet(f"{tmp}/mhidx_v2")
    print(f"  survivors: {n_surv}; index upserted -> {tmp}/mhidx_v2 "
          f"({spark.read.parquet(f'{tmp}/mhidx_v2').count()} docs)")

    toks = bpe_encode(survivors, load_bpe(f"{tmp}/bpe.json"))
    stats = toks.agg(
        F.sum("n_bpe_tokens").alias("total"),
        F.round(F.avg("n_bpe_tokens"), 1).alias("avg"),
    ).collect()[0]
    print(f"  tokenized survivors with SAVED merges: {stats['total']} "
          f"BPE tokens total, {stats['avg']} avg/doc")

    # quality-gate the survivors against the MERGED corpus LM: the
    # persisted count index absorbs the delta's counts (union+sum) and
    # only the survivors tokenize for scoring (q236's daily shape)
    tstats = corpus_stats_index_merge(
        spark.read.parquet(f"{tmp}/stats"), corpus_stats_index(survivors)
    ).persist()
    lm = bigram_lm_from_index(survivors, tstats)
    worst = lm.orderBy("avg_logprob", "doc_id").limit(3).collect()
    print("  LM quality gate vs merged corpus stats (3 least-fluent "
          "survivors):")
    for r in worst:
        print(f"    doc {r['doc_id']}: avg_logprob {r['avg_logprob']:.4f} "
              f"({r['n_bigrams']} bigrams)")

    q = emb.filter(F.col("vec_id") < 5)
    nn = ivf_topk_persisted(spark, f"{tmp}/ivf", q, k=3, nprobe=4)
    print("  ANN neighbors from PERSISTED index (query batch of 5):")
    for r in nn.orderBy("query_id", "rank").collect():
        print(f"    q{r['query_id']} -> {r['nbr_id']} "
              f"(cosine {r['cosine']:.4f}, rank {r['rank']})")
    print("== day 2: a DSAR erasure request propagates into the indexes ==")
    from streaming_feature_store_spark.operators.dedup import (
        erase_from_minhash_index,
    )
    from streaming_feature_store_spark.operators.similarity import (
        erase_from_ivf_index,
    )

    erase_docs = docs.filter(F.col("doc_id") % 97 == 0).select("doc_id")
    idx2 = spark.read.parquet(f"{tmp}/mhidx_v2")
    purged = erase_from_minhash_index(idx2, erase_docs)
    print(f"  dedup index: {idx2.count()} -> {purged.count()} docs after "
          f"purging {erase_docs.count()} erased ids")
    erase_vecs = emb.filter(F.col("vec_id") % 97 == 0).select("vec_id")
    n_cells = erase_from_ivf_index(spark, f"{tmp}/ivf", erase_vecs)
    print(f"  ANN index:   {erase_vecs.count()} vectors purged; only "
          f"{n_cells}/16 cell partitions rewritten")
    from streaming_feature_store_spark.operators.dedup import (
        dedup_clusters,
        erase_from_cluster_index,
        minhash_index_pairs,
    )

    pairs = minhash_index_pairs(idx2, threshold=0.5).select("doc_a", "doc_b")
    labels = dedup_clusters(pairs)
    # erase a cluster REPRESENTATIVE — the hard case: the min-id label
    # retires and the component may split; repair re-solves only the
    # affected component
    victim = labels.orderBy("node").limit(1).select("node")
    repaired = erase_from_cluster_index(labels, pairs, victim)
    vid = victim.collect()[0]["node"]
    old = {r["node"]: r["cluster_id"] for r in labels.collect()}
    new = {r["node"]: r["cluster_id"] for r in repaired.collect()}
    changed = sum(1 for n in new if old.get(n) != new[n])
    print(f"  cluster labels: erased representative doc {vid}; "
          f"{labels.count()} -> {repaired.count()} rows, "
          f"{changed} relabeled (affected component re-solved only)")
    print("== day 3: retention sweep bounds snapshot growth ==")
    # The streaming sinks (streaming/dedup.py) version every index write
    # as <root>/v=<batch_id+1> so a retried batch can re-read its
    # pre-batch snapshot and concurrent readers keep their version.  The
    # cost is retained history: without a sweep the index root grows one
    # full snapshot per batch.  Stage this demo's three index states as
    # the snapshot lineage they would be under the sink, then prune.
    from streaming_feature_store_spark.streaming.dedup import (
        prune_snapshots,
    )

    snap_root = f"{tmp}/mhidx_snapshots"
    spark.read.parquet(f"{tmp}/mhidx").write.parquet(f"{snap_root}/v=1")
    spark.read.parquet(f"{tmp}/mhidx_v2").write.parquet(f"{snap_root}/v=2")
    purged.write.parquet(f"{snap_root}/v=3")
    before = sorted(os.listdir(snap_root))
    pruned = prune_snapshots(snap_root, keep_last=2)
    after = sorted(os.listdir(snap_root))
    print(f"  snapshots before sweep: {before}")
    print(f"  pruned versions {pruned} (keep_last=2 — never 1, so an "
          f"in-flight retry of the current batch keeps its pre-batch view)")
    print(f"  snapshots after sweep:  {after}; newest still queryable: "
          f"{spark.read.parquet(f'{snap_root}/v=3').count()} docs")
    print("== done: recurring cost priced on the delta; corpus state reused ==")
    spark.stop()


if __name__ == "__main__":
    main()
