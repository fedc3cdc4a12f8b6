"""Round-9 scale probes: does incrementality actually pay?

1. Incremental dedup-against-index at 100k docs: one-time index build on
   the 99% base corpus, then a 1% daily-delta merge against the PERSISTED
   (parquet round-tripped) index — timed against the full recompute a
   non-incremental pipeline would run every day.  Asserts pair-set parity
   (base pairs + merge pairs == full recompute) at this scale, not just
   at the sf0.01 oracle scale.

2. Persisted IVF ANN at 100k vectors: one-time save_ivf_index, then the
   per-query-batch cost of ivf_topk_persisted (pre-assigned, partition-
   pruned cells) vs ivf_topk (re-picks centroids + re-assigns the corpus
   per call) — the retrieval-eval hot-loop shape.

Usage: python tools/scale_r9_probe.py [n_docs] [n_vecs]
Rows land in PERFORMANCE.md (round-9 section).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from streaming_feature_store_spark.session import get_spark
from tools.scale_dedup_probe import synth_docs, synth_vecs


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    el = time.time() - t0
    print(f"{label}: {el:.1f}s")
    return out, el


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("scale-r9")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r9probe_")

    from streaming_feature_store_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_merge,
        minhash_index_pairs,
        minhash_near_dups,
    )

    docs = synth_docs(spark, n_docs)
    # the newest 1% is the daily delta (includes the near-dup tail slice,
    # so the merge has real pairs to find)
    cut = int(n_docs * 0.99)
    base = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)

    full, t_full = timed(
        f"full minhash_near_dups recompute ({n_docs} docs)",
        lambda: sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_near_dups(docs, threshold=0.5).collect()
        ),
    )
    _, t_build = timed(
        f"one-time index build + persist ({cut} docs)",
        lambda: build_minhash_index(base)
        .write.mode("overwrite")
        .parquet(f"{tmp}/mhidx"),
    )
    idx = spark.read.parquet(f"{tmp}/mhidx")
    merged, t_merge = timed(
        f"incremental merge of {n_docs - cut}-doc delta vs persisted index",
        lambda: sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_index_merge(delta, idx, threshold=0.5)[0].collect()
        ),
    )
    base_pairs, _ = timed(
        "base pairs from index (bookkeeping, not on the daily path)",
        lambda: sorted(
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in minhash_index_pairs(idx, threshold=0.5).collect()
        ),
    )
    assert sorted(base_pairs + merged) == full, (
        len(base_pairs), len(merged), len(full)
    )
    print(
        f"PARITY OK: {len(base_pairs)} base + {len(merged)} delta pairs "
        f"== {len(full)} full; daily cost {t_merge:.1f}s vs recompute "
        f"{t_full:.1f}s ({t_full / t_merge:.1f}x)"
    )

    from streaming_feature_store_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_persisted,
        save_ivf_index,
    )

    vecs = synth_vecs(spark, n_vecs).cache()
    vecs.count()
    q = vecs.filter(F.col("vec_id") < 64)
    live, t_live = timed(
        f"ivf_topk live (centroids+assign per call, {n_vecs} vecs)",
        lambda: sorted(
            tuple(r)
            for r in ivf_topk(
                vecs, q, dim=64, k=3, nlist=64, nprobe=8
            ).collect()
        ),
    )
    _, t_save = timed(
        "one-time save_ivf_index",
        lambda: save_ivf_index(vecs, f"{tmp}/ivf", nlist=64),
    )
    pers, t_pers = timed(
        "ivf_topk_persisted (pre-assigned cells)",
        lambda: sorted(
            tuple(r)
            for r in ivf_topk_persisted(
                spark, f"{tmp}/ivf", q, k=3, nprobe=8
            ).collect()
        ),
    )
    assert pers == live, (len(pers), len(live))
    print(
        f"PARITY OK: persisted == live top-k; per-batch query cost "
        f"{t_pers:.1f}s vs {t_live:.1f}s live ({t_live / t_pers:.1f}x), "
        f"one-time save {t_save:.1f}s"
    )

    from streaming_feature_store_spark.operators.similarity import (
        ivf_index_merge,
    )

    vdelta = synth_vecs(spark, n_vecs // 100, dim=64, n_twins=0).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
    )
    _, t_vmerge = timed(
        f"ivf_index_merge of {n_vecs // 100}-vector delta (append to cells)",
        lambda: ivf_index_merge(spark, f"{tmp}/ivf", vdelta),
    )
    print(
        f"vector ingest: {t_vmerge:.1f}s per 1% delta vs {t_save:.1f}s "
        f"full re-save ({t_save / t_vmerge:.1f}x)"
    )

    from streaming_feature_store_spark.operators.dedup import (
        exact_dup_groups,
        fingerprint_index_merge,
    )

    _, t_fpfull = timed(
        f"full exact_dup_groups recompute ({n_docs} docs)",
        lambda: exact_dup_groups(docs).write.mode("overwrite").format(
            "noop"
        ).save(),
    )
    exact_dup_groups(base).write.mode("overwrite").parquet(f"{tmp}/fpidx")
    fpidx = spark.read.parquet(f"{tmp}/fpidx")
    def _fp_merge():
        screen, updated = fingerprint_index_merge(delta, fpidx)
        screen.write.mode("overwrite").format("noop").save()
        updated.write.mode("overwrite").format("noop").save()
    _, t_fpmerge = timed(
        f"fingerprint screen+upsert of {n_docs - cut}-doc delta",
        lambda: _fp_merge(),
    )
    print(
        f"exact screen: {t_fpmerge:.1f}s per delta vs {t_fpfull:.1f}s full "
        f"recompute ({t_fpfull / t_fpmerge:.1f}x)"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
