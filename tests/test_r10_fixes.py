"""Round-10 fixes pinned by tests: line_dedup literal separators,
token_chunk_text NULL propagation, blocked_link column-collision guard,
and decayed_topk's distributed top-k plan (VERDICT r9 findings + ADVICE)."""

import pytest
import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.text import (
    line_dedup,
    token_chunk_text,
)


# --- line_dedup: line_sep is a LITERAL, not a regex (ADVICE r9) -------------


def test_line_dedup_metachar_separator_splits_literally(spark):
    # '|' is a regex alternation metachar: unescaped it splits on EVERY
    # character.  The separator must behave as a literal.
    docs = spark.createDataFrame(
        [
            (1, "keep me|shared line|unique one"),
            (2, "shared line|other text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in line_dedup(docs, line_sep="|", min_docs=2).collect()
    }
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == "keep me|unique one"
    assert out[2]["clean_text"] == "other text"


def test_line_dedup_dot_separator(spark):
    docs = spark.createDataFrame(
        [(1, "a b.c d"), (2, "c d.e f")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(docs, line_sep=".", min_docs=2).collect()
    }
    assert out == {1: "a b", 2: "e f"}


# --- token_chunk_text: NULL text stays NULL (ADVICE r9) ---------------------


def test_token_chunk_null_text_propagates(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["chunked"]
        for r in token_chunk_text(docs, chunk_size=2).collect()
    }
    assert rows[1] == "a b\nc d\ne"
    assert rows[2] is None
    # ... so a NULL doc composed through line_dedup is ABSENT, matching
    # the q229 oracle where NULL propagates through the tokenizer
    chunked = token_chunk_text(docs, chunk_size=2)
    ld = line_dedup(
        chunked, text_col="chunked", line_sep="\n", out_sep=" ", min_docs=2
    )
    assert [r["doc_id"] for r in ld.collect()] == [1]


# --- blocked_link: renaming-collision guard (ADVICE r9) ----------------------


def test_blocked_link_rejects_colliding_probe_columns(spark):
    from streaming_feature_store_spark.operators.enrich import blocked_link

    master = spark.createDataFrame(
        [(1, "acme", 10)], "mid long, brand string, size long"
    )
    probe_prefixed = spark.createDataFrame(
        [(1, "acme", 10, 99)], "pid long, brand string, size long, m_mid long"
    )
    with pytest.raises(ValueError, match="prefixed master columns"):
        blocked_link(
            probe_prefixed, master, ["brand"], "pid", "mid",
            score=F.lit(1.0), min_score=0.0,
        )
    probe_reserved = spark.createDataFrame(
        [(1, "acme", 0.5)], "pid long, brand string, _score double"
    )
    with pytest.raises(ValueError, match="internal working columns"):
        blocked_link(
            probe_reserved, master, ["brand"], "pid", "mid",
            score=F.lit(1.0), min_score=0.0,
        )


def test_blocked_link_still_links_clean_inputs(spark):
    from streaming_feature_store_spark.operators.enrich import blocked_link

    master = spark.createDataFrame(
        [(1, "acme", 10), (2, "acme", 11)], "mid long, brand string, size long"
    )
    probe = spark.createDataFrame(
        [(100, "acme", 10)], "pid long, brand string, size long"
    )
    out = blocked_link(
        probe, master, ["brand"], "pid", "mid",
        score=F.lit(1.0) - F.abs(F.col("size") - F.col("m_size")) / 10.0,
        min_score=0.5, band_col="size", band=1,
    ).collect()
    assert len(out) == 1 and out[0]["matched_id"] == 1


# --- decayed_topk: distributed top-k, no full-frame window sort --------------


def test_decayed_topk_plan_and_results(spark):
    from streaming_feature_store_spark.operators.behavior import (
        daily_count_index,
        decayed_topk,
    )

    df = spark.createDataFrame(
        [(f"item{i % 9}", f"2024-01-{(i % 25) + 1:02d}") for i in range(300)],
        "item string, day string",
    ).select("item", F.col("day").cast("date").alias("day"))
    idx = daily_count_index(df, "item", "day")
    out = decayed_topk(idx, "2024-01-26", k=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    assert rows == sorted(
        rows, key=lambda r: (-r["decayed_weight"], r["item"])
    )
