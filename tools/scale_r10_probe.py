"""Round-10 scale probe: does the incremental corpus-statistics index pay?

The daily quality-gate shape at 100k docs: a 1% delta arrives; the
non-incremental pipeline re-tokenizes the WHOLE corpus to rebuild
DF/unigram/bigram tables and then scores the delta; the incremental
pipeline merges the delta's (vocabulary-bounded) count index into the
persisted (parquet round-tripped) corpus index and tokenizes ONLY the
delta.  Both paths' delta-doc scores are asserted EXACTLY equal at probe
scale, not just at the sf0.01 oracle scale.  Same comparison for BM25
over the persisted postings index (query cost with NO corpus
tokenization vs bm25_topk's full tokenize per call).

Usage: python tools/scale_r10_probe.py [n_docs]
Rows land in PERFORMANCE.md (round-10 section).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from streaming_feature_store_spark.session import get_spark
from tools.scale_dedup_probe import synth_docs


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    el = time.time() - t0
    print(f"{label}: {el:.1f}s")
    return out, el


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("scale-r10")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r10probe_")

    from streaming_feature_store_spark.operators.text import (
        bigram_lm_doclogprob,
        bigram_lm_from_index,
        bm25_from_index,
        bm25_topk,
        corpus_stats_index,
        corpus_stats_index_merge,
        postings_index,
        postings_index_merge,
        unigram_nll,
        unigram_nll_from_index,
    )

    docs = synth_docs(spark, n_docs)
    cut = int(n_docs * 0.99)
    base = docs.filter(F.col("doc_id") < cut).persist()
    delta = docs.filter(F.col("doc_id") >= cut).persist()
    base.count(), delta.count()

    # ---- one-time state (amortized): corpus-stats + postings indexes
    _, t_build = timed(
        f"one-time corpus_stats_index build + persist ({cut} docs)",
        lambda: corpus_stats_index(base)
        .write.mode("overwrite")
        .parquet(f"{tmp}/stats"),
    )
    _, t_post = timed(
        f"one-time postings_index build + persist ({cut} docs)",
        lambda: postings_index(base)
        .write.mode("overwrite")
        .parquet(f"{tmp}/postings"),
    )

    # ---- daily path A (non-incremental): full recompute, score delta
    def full_day():
        spark.catalog.clearCache()
        nll = unigram_nll(docs).filter(F.col("doc_id") >= cut)
        lm = bigram_lm_doclogprob(docs).filter(F.col("doc_id") >= cut)
        return canon(nll.join(lm, "doc_id", "left"))

    want, t_full = timed(
        f"FULL daily recompute (re-tokenize {n_docs} docs, score delta)",
        full_day,
    )

    # ---- daily path B (incremental): merge delta index, score delta
    def inc_day():
        spark.catalog.clearCache()
        idx = spark.read.parquet(f"{tmp}/stats")
        merged = corpus_stats_index_merge(
            idx, corpus_stats_index(delta)
        ).persist()
        nll = unigram_nll_from_index(delta, merged)
        lm = bigram_lm_from_index(delta, merged)
        out = canon(nll.join(lm, "doc_id", "left"))
        # production persists the merged index for tomorrow
        merged.write.mode("overwrite").parquet(f"{tmp}/stats_v2")
        return out

    got, t_inc = timed(
        f"INCREMENTAL daily path (merge {n_docs - cut}-doc delta index, "
        "score delta, persist v2)",
        inc_day,
    )
    assert got == want, "incremental delta scores != full recompute"
    print(
        f"EXACT PARITY at {n_docs} docs; daily quality gate "
        f"{t_full:.1f}s -> {t_inc:.1f}s ({t_full / t_inc:.1f}x); "
        f"one-time build {t_build:.1f}s amortizes in "
        f"{t_build / max(t_full - t_inc, 1e-9):.1f} days"
    )

    # ---- BM25: persisted postings vs full tokenize per query call
    qdf = spark.createDataFrame(
        [("q1", "w1 w7 w13"), ("q2", "w2 w9"), ("q3", "w21 w33 w5")],
        "query_id string, query_text string",
    )

    def bm25_full():
        spark.catalog.clearCache()
        return canon(bm25_topk(docs, qdf, k=10))

    want_b, t_bfull = timed(
        f"bm25_topk full tokenize-and-score ({n_docs} docs)", bm25_full
    )

    def bm25_inc():
        spark.catalog.clearCache()
        postings = postings_index_merge(
            spark.read.parquet(f"{tmp}/postings"), postings_index(delta)
        ).persist()
        stats = corpus_stats_index_merge(
            spark.read.parquet(f"{tmp}/stats"), corpus_stats_index(delta)
        ).persist()
        return canon(bm25_from_index(postings, stats, qdf, k=10))

    got_b, t_binc = timed(
        "bm25_from_index (merge delta postings, NO corpus tokenize)",
        bm25_inc,
    )
    assert got_b == want_b, "bm25 from index != full recompute"
    print(
        f"EXACT PARITY; bm25 query batch {t_bfull:.1f}s -> {t_binc:.1f}s "
        f"({t_bfull / t_binc:.1f}x)"
    )

    # ---- CCNet line dedup: merged line-frequency index vs full rescan
    from streaming_feature_store_spark.operators.text import (
        line_dedup,
        line_dedup_from_index,
        line_freq_index,
        line_freq_index_merge,
        token_chunk_text,
    )

    chunked_base = token_chunk_text(base, chunk_size=4)
    _, t_lf = timed(
        f"one-time line_freq_index build + persist ({cut} docs)",
        lambda: line_freq_index(chunked_base, text_col="chunked")
        .write.mode("overwrite")
        .parquet(f"{tmp}/linefreq"),
    )

    def ld_full():
        spark.catalog.clearCache()
        out = line_dedup(
            token_chunk_text(docs, chunk_size=4),
            text_col="chunked",
            line_sep="\n",
            out_sep=" ",
            min_docs=2,
        ).filter(F.col("doc_id") >= cut)
        return canon(out)

    want_l, t_lfull = timed(
        f"FULL line_dedup (re-segment {n_docs} docs, clean delta)", ld_full
    )

    def ld_inc():
        spark.catalog.clearCache()
        cdelta = token_chunk_text(delta, chunk_size=4).persist()
        merged = line_freq_index_merge(
            spark.read.parquet(f"{tmp}/linefreq"),
            line_freq_index(cdelta, text_col="chunked"),
        )
        return canon(
            line_dedup_from_index(
                cdelta, merged, min_docs=2, text_col="chunked", out_sep=" "
            )
        )

    got_l, t_linc = timed(
        "INCREMENTAL line_dedup (merge delta line counts, clean delta only)",
        ld_inc,
    )
    assert got_l == want_l, "incremental line dedup != full recompute"
    print(
        f"EXACT PARITY; line-dedup daily pass {t_lfull:.1f}s -> "
        f"{t_linc:.1f}s ({t_lfull / t_linc:.1f}x)"
    )

    # ---- winnowing containment: persisted fingerprint index vs full
    from streaming_feature_store_spark.operators.text import (
        build_winnow_index,
        winnow_containment_pairs,
        winnow_index_merge,
    )

    _, t_wb = timed(
        f"one-time build_winnow_index + persist ({cut} docs)",
        lambda: build_winnow_index(base)
        .write.mode("overwrite")
        .parquet(f"{tmp}/winnow"),
    )

    def wn_full():
        spark.catalog.clearCache()
        pairs = winnow_containment_pairs(docs, threshold=0.5).filter(
            (F.col("doc_a") >= cut) | (F.col("doc_b") >= cut)
        )
        return canon(pairs)

    want_w, t_wfull = timed(
        f"FULL winnow pairs (re-fingerprint {n_docs} docs, delta pairs)",
        wn_full,
    )

    def wn_inc():
        spark.catalog.clearCache()
        idx = spark.read.parquet(f"{tmp}/winnow")
        new_pairs, _ = winnow_index_merge(delta, idx, threshold=0.5)
        return canon(new_pairs)

    got_w, t_winc = timed(
        "INCREMENTAL winnow (fingerprint delta only, join persisted index)",
        wn_inc,
    )
    assert got_w == want_w, "incremental winnow pairs != full recompute"
    print(
        f"EXACT PARITY; winnow containment screen {t_wfull:.1f}s -> "
        f"{t_winc:.1f}s ({t_wfull / t_winc:.1f}x)"
    )
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
