"""Curation-family operators: end-to-end curation, decontamination,
mixture sampling, chunking, repetition stats."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.curation import (
    chunk_documents,
    curate_documents,
    decontaminate,
    sample_corpus,
)
from streaming_feature_store_spark.operators.text import repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_documents_removes_dups_and_junk(spark):
    base = " ".join(f"w{i}" for i in range(20))
    near = " ".join(f"w{i}" for i in range(19)) + " zz"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0 → dropped
        (2, near),  # near dup of 0 (jaccard >> 0.5) → dropped
        (3, "too short"),  # < 10 tokens → dropped
        (4, " ".join(["the"] * 6 + ["x"] * 5)),  # stopword ratio 6/11 → dropped
        (5, " ".join(f"u{i}" for i in range(15))),  # clean survivor
    ]
    out = curate_documents(_docs(spark, rows)).select("doc_id").collect()
    assert sorted(r["doc_id"] for r in out) == [0, 5]


def test_decontaminate_flags_and_scores(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    train = _docs(spark, [(0, shared + " trailing tokens here")])
    evals = _docs(
        spark,
        [
            (100, shared),  # fully contained: every 8-gram shared
            (101, " ".join(f"c{i}" for i in range(10))),  # clean
            (102, "short doc"),  # < 8 tokens → no grams, never flagged
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, evals, n=8).collect()
    }
    assert out[100]["is_contaminated"] and out[100]["containment"] == 1.0
    assert not out[101]["is_contaminated"] and out[101]["n_shared_grams"] == 0
    assert not out[102]["is_contaminated"] and out[102]["n_grams"] == 0


def test_sample_corpus_rates_and_stability(spark):
    rows = [(i, "t", "src0" if i % 2 else "src1") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = sample_corpus(df, {"src0": 1.0, "src1": 0.0}, default_rate=0.5)
    got = kept.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts.get("src0") == 200  # rate 1.0 keeps every row
    assert "src1" not in counts  # rate 0.0 keeps none

    half = sample_corpus(df, {}, default_rate=0.5)
    ids1 = {r["doc_id"] for r in half.select("doc_id").collect()}
    # deterministic: identical second run
    ids2 = {r["doc_id"] for r in half.select("doc_id").collect()}
    assert ids1 == ids2
    assert 120 <= len(ids1) <= 280  # ~50 % of 400, md5-uniform
    # stability: growing the corpus never flips an existing decision
    bigger = spark.createDataFrame(
        rows + [(1000 + i, "t", "srcX") for i in range(100)],
        "doc_id long, text string, source string",
    )
    ids3 = {
        r["doc_id"]
        for r in sample_corpus(bigger, {}, default_rate=0.5)
        .select("doc_id")
        .collect()
    }
    assert ids1 == {i for i in ids3 if i < 1000}


def test_chunk_documents_windows(spark):
    text = " ".join(f"t{i}" for i in range(50))
    out = chunk_documents(
        _docs(spark, [(7, text)]), chunk_size=32, stride=24
    ).collect()
    by_idx = {r["chunk_idx"]: r for r in sorted(out, key=lambda r: r["chunk_idx"])}
    assert list(by_idx) == [0, 1, 2]  # starts 0, 24, 48
    assert by_idx[0]["n_chunk_tokens"] == 32
    assert by_idx[1]["n_chunk_tokens"] == 26  # tokens 24..49
    assert by_idx[2]["n_chunk_tokens"] == 2
    assert by_idx[0]["chunk_text"].split(" ")[0] == "t0"
    assert by_idx[1]["chunk_text"].split(" ")[0] == "t24"
    # overlap: chunk 1 re-covers tokens 24..31 of chunk 0
    assert by_idx[0]["chunk_text"].split(" ")[-1] == "t31"


def test_repetition_stats_flags(spark):
    rows = [
        (0, "a a a a b"),  # top token 4/5 = 0.8 → flagged
        (1, "x y z x y z x y z"),  # 7 gram slots, 3 distinct → 4/7 dup
        (2, " ".join(f"w{i}" for i in range(12))),  # all distinct → clean
    ]
    out = {r["doc_id"]: r for r in repetition_stats(_docs(spark, rows)).collect()}
    assert out[0]["top_token_frac"] == 0.8 and out[0]["is_repetitive"]
    assert abs(out[1]["dup_3gram_frac"] - 4 / 7) < 1e-6 and out[1]["is_repetitive"]
    assert not out[2]["is_repetitive"] and out[2]["dup_3gram_frac"] == 0.0


def test_pii_stats_and_redaction(spark):
    from streaming_feature_store_spark.operators.text import pii_stats, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "call 555-123-4567 or +44 123-456-7890 now"),
            (3, "server at 10.0.200.13 responded"),
            (4, "nothing sensitive here at all"),
        ],
        "doc_id long, text string",
    )
    stats = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (stats[1]["n_emails"], stats[1]["n_phones"], stats[1]["n_ips"]) == (1, 0, 0)
    assert stats[2]["n_phones"] == 2
    assert stats[3]["n_ips"] == 1
    assert (stats[4]["n_emails"], stats[4]["n_phones"], stats[4]["n_ips"]) == (0, 0, 0)

    red = {r["doc_id"]: r["text"] for r in redact_pii(df).collect()}
    assert red[1] == "mail me at <EMAIL> today"
    assert red[2] == "call <PHONE> or +44 <PHONE> now"
    assert red[3] == "server at <IP> responded"
    assert red[4] == "nothing sensitive here at all"
