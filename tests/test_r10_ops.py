"""Round-10 incremental corpus-statistics indexes (q235-q237): additive
(kind, term, n) count tables + (doc, term, tf) postings, exact under
merge(index(base), index(delta)) == index(base UNION delta) for disjoint
doc sets, with delta-only scoring equal to the full recompute."""

import pytest
import random

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.text import (
    bigram_lm_doclogprob,
    bigram_lm_from_index,
    bm25_from_index,
    bm25_topk,
    corpus_stats_index,
    corpus_stats_index_merge,
    postings_index,
    postings_index_merge,
    tfidf_top_terms,
    tfidf_top_terms_from_index,
    unigram_nll,
    unigram_nll_from_index,
)

_VOCAB = (
    "spark hash join window batch stream data query the a vector scan"
).split()


def _docs(spark, n=120, seed=3, with_null=True):
    rng = random.Random(seed)
    rows = [
        (i, " ".join(rng.choice(_VOCAB) for _ in range(rng.randrange(1, 20))))
        for i in range(n)
    ]
    if with_null:
        rows += [(n, None), (n + 1, "zzz"), (n + 2, "q")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def _split(docs):
    return (
        docs.filter(F.col("doc_id") % 4 != 0),
        docs.filter(F.col("doc_id") % 4 == 0),
    )


def test_stats_index_merge_equals_full_build(spark):
    docs = _docs(spark)
    base, delta = _split(docs)
    merged = corpus_stats_index_merge(
        corpus_stats_index(base), corpus_stats_index(delta)
    )
    assert _canon(merged) == _canon(corpus_stats_index(docs))


def test_stats_index_docs_row_counts_null_text_docs(spark):
    docs = _docs(spark, n=10)
    idx = corpus_stats_index(docs, bigrams=False)
    n = idx.filter(F.col("kind") == "docs").collect()
    assert len(n) == 1 and n[0]["n"] == 13  # 10 + NULL + 'zzz' + 'q'


def test_stats_index_merge_empty_delta_is_identity_except_docs(spark):
    docs = _docs(spark, n=30)
    empty = docs.filter(F.lit(False))
    merged = corpus_stats_index_merge(
        corpus_stats_index(docs), corpus_stats_index(empty)
    )
    # the empty delta contributes docs=0 and no term rows
    assert _canon(merged) == _canon(corpus_stats_index(docs))


def test_tfidf_from_index_matches_full_recompute(spark):
    docs = _docs(spark)
    base, delta = _split(docs)
    merged = corpus_stats_index_merge(
        corpus_stats_index(base, bigrams=False),
        corpus_stats_index(delta, bigrams=False),
    ).persist()
    got = tfidf_top_terms_from_index(delta, merged, k=3)
    want = tfidf_top_terms(docs, k=3).filter(F.col("doc_id") % 4 == 0)
    assert _canon(got) == _canon(want)


def test_unigram_nll_from_index_matches_full_recompute(spark):
    docs = _docs(spark)
    base, delta = _split(docs)
    merged = corpus_stats_index_merge(
        corpus_stats_index(base, bigrams=False),
        corpus_stats_index(delta, bigrams=False),
    ).persist()
    got = unigram_nll_from_index(delta, merged)
    want = unigram_nll(docs).filter(F.col("doc_id") % 4 == 0)
    assert _canon(got) == _canon(want)


def test_bigram_lm_from_index_matches_full_recompute(spark):
    docs = _docs(spark)
    base, delta = _split(docs)
    merged = corpus_stats_index_merge(
        corpus_stats_index(base), corpus_stats_index(delta)
    ).persist()
    got = bigram_lm_from_index(delta, merged)
    want = bigram_lm_doclogprob(docs).filter(F.col("doc_id") % 4 == 0)
    assert _canon(got) == _canon(want)
    # single-token doc ('q') is in neither side; NULL-text doc absent
    ids = {r["doc_id"] for r in got.collect()}
    assert 121 not in ids and 122 not in ids


def test_postings_merge_equals_full_and_bm25_from_index(spark):
    docs = _docs(spark)
    base, delta = _split(docs)
    pm = postings_index_merge(
        postings_index(base), postings_index(delta)
    ).persist()
    assert _canon(pm) == _canon(postings_index(docs))
    stats = corpus_stats_index_merge(
        corpus_stats_index(base, bigrams=False),
        corpus_stats_index(delta, bigrams=False),
    ).persist()
    qdf = spark.createDataFrame(
        [("q1", "hash join strategy"), ("q2", "the vector scan")],
        "query_id string, query_text string",
    )
    got = bm25_from_index(pm, stats, qdf, k=5)
    want = bm25_topk(docs, qdf, k=5)
    assert _canon(got) == _canon(want)


def test_postings_index_has_one_length_row_per_tokenized_doc(spark):
    docs = _docs(spark, n=8)
    p = postings_index(docs)
    dl = p.filter(F.col("term").isNull())
    # NULL-text doc carries no rows; 'zzz' and 'q' tokenize to 1 token
    assert dl.count() == 10
    tot_tf = p.filter(F.col("term").isNotNull()).agg(F.sum("n")).collect()[0][0]
    tot_dl = dl.agg(F.sum("n")).collect()[0][0]
    assert tot_tf == tot_dl


@pytest.mark.slow
def test_three_way_merge_is_order_independent(spark):
    docs = _docs(spark, n=90)
    a = docs.filter(F.col("doc_id") % 3 == 0)
    b = docs.filter(F.col("doc_id") % 3 == 1)
    c = docs.filter(F.col("doc_id") % 3 == 2)
    ia, ib, ic = (corpus_stats_index(x) for x in (a, b, c))
    m1 = corpus_stats_index_merge(corpus_stats_index_merge(ia, ib), ic)
    m2 = corpus_stats_index_merge(ia, corpus_stats_index_merge(ic, ib))
    assert _canon(m1) == _canon(m2) == _canon(corpus_stats_index(docs))


def test_dsir_from_index_matches_full_recompute(spark):
    from streaming_feature_store_spark.operators.curation import (
        dsir_weights_from_index,
        importance_weights,
    )

    docs = _docs(spark).withColumn(
        "lang", F.when(F.col("doc_id") % 3 == 0, "en").otherwise("de")
    )
    base, delta = _split(docs)
    en = F.col("lang") == "en"
    stats = corpus_stats_index_merge(
        corpus_stats_index(base, bigrams=False),
        corpus_stats_index(delta, bigrams=False),
    ).persist()
    tstats = corpus_stats_index_merge(
        corpus_stats_index(base.filter(en), bigrams=False),
        corpus_stats_index(delta.filter(en), bigrams=False),
    ).persist()
    got = dsir_weights_from_index(delta, stats, tstats)
    want = importance_weights(docs, docs.filter(en)).filter(
        F.col("doc_id") % 4 == 0
    )
    assert _canon(got) == _canon(want)


def test_corpus_stats_index_erase_equals_rebuild_over_survivors(spark):
    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index_erase,
    )

    docs = _docs(spark)
    erased = docs.filter(F.col("doc_id") % 7 == 0)
    survivors = docs.filter(F.col("doc_id") % 7 != 0)
    idx = corpus_stats_index(docs).persist()
    got = corpus_stats_index_erase(idx, erased)
    want = corpus_stats_index(survivors)
    # rebuild keeps zero-count rows only where it never saw the term;
    # erase drops zeroed rows — compare non-zero content
    assert _canon(got.filter(F.col("n") != 0)) == _canon(
        want.filter(F.col("n") != 0)
    )
    # bigrams flag inferred from the index: a bigram-free index erases
    # without negating 'bi' rows
    idx2 = corpus_stats_index(docs, bigrams=False).persist()
    got2 = corpus_stats_index_erase(idx2, erased)
    assert got2.filter(F.col("kind") == "bi").count() == 0
    want2 = corpus_stats_index(survivors, bigrams=False)
    assert _canon(got2.filter(F.col("n") != 0)) == _canon(
        want2.filter(F.col("n") != 0)
    )


def test_postings_index_erase_equals_rebuild_over_survivors(spark):
    from streaming_feature_store_spark.operators.text import (
        postings_index_erase,
    )

    docs = _docs(spark)
    erased = docs.filter(F.col("doc_id") % 7 == 0)
    survivors = docs.filter(F.col("doc_id") % 7 != 0)
    got = postings_index_erase(postings_index(docs), erased)
    assert _canon(got) == _canon(postings_index(survivors))


def test_line_freq_index_merge_and_dedup_from_index(spark):
    from streaming_feature_store_spark.operators.text import (
        line_dedup,
        line_dedup_from_index,
        line_freq_index,
        line_freq_index_merge,
    )

    docs = spark.createDataFrame(
        [
            (1, "keep one\nshared a\nshared b"),
            (2, "shared a\nother text"),
            (3, "shared b\nshared a\nshared b"),   # repeats within doc
            (4, "fresh delta\nshared a"),
            (8, "delta only\nshared b"),
        ],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    merged = line_freq_index_merge(
        line_freq_index(base), line_freq_index(delta)
    )
    assert _canon(merged) == _canon(line_freq_index(docs))
    got = line_dedup_from_index(delta, merged, min_docs=2)
    want = line_dedup(docs, min_docs=2).filter(F.col("doc_id") % 4 == 0)
    assert _canon(got) == _canon(want)
    rows = {r["doc_id"]: r.asDict() for r in got.collect()}
    # 'shared a'/'shared b' are corpus boilerplate; delta keeps the rest
    assert rows[4]["clean_text"] == "fresh delta"
    assert rows[8]["clean_text"] == "delta only"


def test_winnow_index_merge_union_equals_full_pairs(spark):
    from streaming_feature_store_spark.operators.text import (
        build_winnow_index,
        winnow_containment_pairs,
        winnow_index_merge,
    )

    # planted shared passages straddling the base/delta split
    passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, passage + " one two three"),
            (2, "totally different words here nothing shared at all ok"),
            (3, passage + " four five six"),                 # base-base pair with 1
            (4, passage + " seven eight nine"),              # delta vs base 1/3
            (8, "totally different words here nothing shared at all ok"),  # delta dup of 2
            (12, passage + " ten eleven twelve"),            # delta-delta with 4
        ],
        "doc_id long, text string",
    )
    base = docs.filter(F.col("doc_id") % 4 != 0)
    delta = docs.filter(F.col("doc_id") % 4 == 0)
    idx = build_winnow_index(base).persist()
    new_pairs, updated = winnow_index_merge(delta, idx, threshold=0.3)
    base_pairs = winnow_containment_pairs(base, threshold=0.3)
    full = winnow_containment_pairs(docs, threshold=0.3)
    assert _canon(base_pairs.unionByName(new_pairs)) == _canon(full)
    # every new pair involves a delta doc
    for r in new_pairs.collect():
        assert r["doc_a"] % 4 == 0 or r["doc_b"] % 4 == 0
    # updated index == fresh build over base ∪ delta
    assert _canon(updated) == _canon(build_winnow_index(docs))


def test_ngram_df_index_merge_and_boilerplate_from_index(spark):
    from streaming_feature_store_spark.operators.text import (
        boilerplate_from_index,
        boilerplate_ngrams,
        ngram_doc_freq_index,
        ngram_doc_freq_index_merge,
    )

    docs = _docs(spark, n=60)
    base, delta = _split(docs)
    merged = ngram_doc_freq_index_merge(
        ngram_doc_freq_index(base, n=3), ngram_doc_freq_index(delta, n=3)
    )
    assert _canon(merged) == _canon(ngram_doc_freq_index(docs, n=3))
    got = boilerplate_from_index(merged, min_docs=4)
    want = boilerplate_ngrams(docs, n=3, min_docs=4)
    assert _canon(got) == _canon(want)
