"""BPE tokenizer: known-answer training (the merges from the Sennrich
BPE paper's canonical corpus), lossless round-trip, and the distributed
apply pinned against an independent pure-Python reference."""

import pytest
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from streaming_feature_store_spark.operators.tokenize import (
    bpe_encode,
    encode_word,
    train_bpe,
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)


def _ref_encode(word, merges):
    """Independent reference: apply merges in TRAINING order, each merge
    exhaustively, like the trainer itself does — equivalent to the
    lowest-rank-first greedy loop, implemented differently."""
    sym = list(word) + ["</w>"]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_learns_canonical_merges(spark):
    # the BPE paper's corpus: low x5, lower x2, newest x6, widest x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(df, n_merges=5)
    # es (9) -> est (9) -> est</w> (9) -> lo (7) -> low (7); frequency
    # ties broken lexicographically
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert merges[3] == ("l", "o") and merges[4] == ("lo", "w")
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("lowest", ranks) == ["low", "est</w>"]
    assert encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]


def test_bpe_encode_distributed_matches_reference(spark):
    rows = [
        (0, "the newest lowest widest thing"),
        (1, "lower and lower the low goes"),
        (2, None),
        (3, "UPPER case; punct-uation!! 123"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, n_merges=20)
    got = {
        r["doc_id"]: (r["bpe_tokens"], r["n_bpe_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    import re

    for i, t in rows:
        words = re.sub(r"[^A-Za-z ]", " ", t or "").lower().split()
        want = [tok for w in words for tok in _ref_encode(w, merges)]
        assert got[i][0] == want, (i, got[i][0], want)
        assert got[i][1] == len(want)


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=4,
    ),
    n_merges=st.integers(min_value=0, max_value=12),
)
@SLOW
@pytest.mark.slow
def test_bpe_property_lossless_and_engine_agrees(spark, docs, n_merges):
    """On arbitrary corpora: (1) concatenating a word's BPE tokens and
    stripping the end-of-word marker reconstructs the word (losslessness
    — BPE only merges, never rewrites); (2) the distributed apply equals
    the independent training-order reference for every document."""
    texts = [" ".join(ws) for ws in docs]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = train_bpe(df, n_merges=n_merges)
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges).collect()
    }
    for i, ws in enumerate(docs):
        want = [tok for w in ws for tok in _ref_encode(w, merges)]
        assert got[i] == want, (i, got[i], want)
        # losslessness per word
        ranks = {p: j for j, p in enumerate(merges)}
        for w in ws:
            toks = encode_word(w, ranks)
            assert "".join(toks) == w + "</w>"


def test_bpe_save_load_roundtrip(spark, tmp_path):
    """r9: a reloaded merge table tokenizes a delta identically to the
    in-memory table (rank order survives the JSON round-trip)."""
    from streaming_feature_store_spark.operators.tokenize import (
        bpe_encode,
        load_bpe,
        save_bpe,
        train_bpe,
    )

    df = spark.createDataFrame(
        [(1, "lower lowest newer newest wider widest"),
         (2, "low new wide lower newer wider")],
        "doc_id long, text string",
    )
    merges = train_bpe(df, n_merges=20, sample_docs=None)
    p = str(tmp_path / "merges.json")
    save_bpe(merges, p)
    assert load_bpe(p) == merges
    delta = spark.createDataFrame(
        [(3, "slower slowest wide new low")], "doc_id long, text string"
    )
    live = bpe_encode(delta, merges).collect()[0]
    reloaded = bpe_encode(delta, load_bpe(p)).collect()[0]
    assert live["bpe_tokens"] == reloaded["bpe_tokens"]
    assert live["n_bpe_tokens"] == reloaded["n_bpe_tokens"]
