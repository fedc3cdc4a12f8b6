"""Extension-surface tests (SURVEY §2.8): the grouped-agg pandas UDF
aggregates correctly per group, and the UDTF chunker emits exactly what the
codegen chunker does on real documents."""

import pyspark.sql.functions as F

from streaming_feature_store_spark.functions.udx import chunk_text_udtf, mad_udf


def test_mad_grouped_agg(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0),
         ("b", 5.0), ("b", None)],
        "k string, v double",
    )
    mad = mad_udf()
    out = {r["k"]: r["m"] for r in df.groupBy("k").agg(mad("v").alias("m")).collect()}
    # group a: median 2.5, |x-2.5| = [1.5, .5, .5, 97.5] -> median 1.0
    assert abs(out["a"] - 1.0) < 1e-9
    # group b: single non-null value -> deviation 0
    assert out["b"] == 0.0
    # all-null group: SQL-agg semantics — NULL, never NaN (ADVICE r3)
    allnull = spark.createDataFrame([("c", None), ("c", None)], "k string, v double")
    row = allnull.groupBy("k").agg(mad("v").alias("m")).collect()[0]
    assert row["m"] is None


def test_udtf_chunker_matches_codegen(spark):
    from streaming_feature_store_spark.operators.curation import chunk_documents
    from streaming_feature_store_spark.sources.file import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    expected = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in chunk_documents(docs, chunk_size=32, stride=24).collect()
    }
    ChunkText = chunk_text_udtf()
    spark.udtf.register("chunk_text", ChunkText)
    docs.createOrReplaceTempView("_udtf_docs")
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
        for r in spark.sql(
            """
            SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_chunk_tokens
            FROM _udtf_docs d,
            LATERAL chunk_text(d.text, 32, 24) c
            """
        ).collect()
    }
    assert got == expected and len(got) > 50
