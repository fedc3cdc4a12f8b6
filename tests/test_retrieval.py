"""BM25 retrieval and DSIR importance-weight contracts.

Both operators are pinned two ways: a hand-computable micro-corpus with
the textbook formula replayed in pure Python, and structural invariants
(rank contiguity, sign of the log-ratio evidence) that must hold on any
input.  The cross-engine value parity lives in the oracled catalog
(q152/q153); these tests pin the MATH, independent of DuckDB.
"""

import math

import pytest

from streaming_feature_store_spark.cacheutil import (
    release_cached_intermediates,
)


@pytest.fixture(autouse=True)
def _release_caches():
    yield
    release_cached_intermediates()


def _bm25_py(docs, query_terms, k1=1.2, b=0.75):
    """Textbook Okapi BM25 (Robertson non-negative idf), per doc."""
    toks = {d: t.lower().split() for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for d, terms in toks.items():
        s = 0.0
        for q in set(query_terms):
            tf = terms.count(q)
            if tf == 0:
                continue
            dfr = sum(1 for t in toks.values() if q in t)
            idf = math.log(1.0 + (n - dfr + 0.5) / (dfr + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(terms) / avgdl)
            )
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_textbook_formula(spark):
    from streaming_feature_store_spark.operators.text import bm25_topk

    rows = [
        ("d1", "spark shuffle join spark spark"),
        ("d2", "broadcast join strategy"),
        ("d3", "window aggregate stream"),
        ("d4", "join join join shuffle plan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    qdf = spark.createDataFrame(
        [("q1", "spark join")], "query_id string, query_text string"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, qdf, k=10).collect()
    }
    want = _bm25_py(rows, ["spark", "join"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_bm25_rank_contiguous_and_bounded(spark):
    from streaming_feature_store_spark.operators.text import bm25_topk

    rows = [(f"d{i}", "alpha beta gamma " * (i + 1)) for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    qdf = spark.createDataFrame(
        [("q1", "alpha"), ("q2", "beta gamma")],
        "query_id string, query_text string",
    )
    out = bm25_topk(docs, qdf, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rank"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        rs.sort(key=lambda r: r["rank"])
        for a, z in zip(rs, rs[1:]):
            assert (a["score"], a["doc_id"]) >= (z["score"], z["doc_id"]) or (
                a["score"] > z["score"]
            )
            assert a["score"] >= z["score"]


def test_importance_weights_self_target_is_zero(spark):
    """target == corpus -> identical smoothed distributions -> every
    document's log-ratio evidence is exactly 0."""
    from streaming_feature_store_spark.operators.curation import (
        importance_weights,
    )

    docs = spark.createDataFrame(
        [("a", "red green blue"), ("b", "red red cyan"), ("c", "blue")],
        "doc_id string, text string",
    )
    out = importance_weights(docs, docs).collect()
    assert len(out) == 3
    for r in out:
        assert r["log_weight"] == pytest.approx(0.0, abs=1e-9)


def test_importance_weights_favor_target_like_docs(spark):
    """Documents made of target-typical terms must outweigh documents of
    target-absent terms, and the exact value matches the smoothed
    unigram algebra replayed in Python."""
    from streaming_feature_store_spark.operators.curation import (
        importance_weights,
    )

    corpus_rows = [
        ("t1", "science method theory"),
        ("t2", "science theory data"),
        ("junk", "spam spam click bait"),
    ]
    docs = spark.createDataFrame(
        corpus_rows, "doc_id string, text string"
    )
    target = docs.filter("doc_id like 't%'")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(docs, target, alpha=0.5).collect()
    }
    assert got["t1"] > got["junk"] and got["t2"] > got["junk"]

    # pure-python replay of the add-alpha union-vocabulary algebra
    s_c, t_c = {}, {}
    for d, txt in corpus_rows:
        for w in txt.split():
            s_c[w] = s_c.get(w, 0) + 1
            if d != "junk":
                t_c[w] = t_c.get(w, 0) + 1
    vocab = set(s_c) | set(t_c)
    s_tot, t_tot, v, a = sum(s_c.values()), sum(t_c.values()), len(vocab), 0.5
    for d, txt in corpus_rows:
        w = sum(
            math.log((t_c.get(t, 0) + a) / (t_tot + a * v))
            - math.log((s_c.get(t, 0) + a) / (s_tot + a * v))
            for t in txt.split()
        )
        assert got[d] == pytest.approx(round(w, 6), abs=2e-6)
