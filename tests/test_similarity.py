"""Similarity-search tests: exact top-k ordering, self-exclusion, and the
LSH path agreeing with brute force on an unambiguous nearest neighbor."""

import pyspark.sql.functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from streaming_feature_store_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.99, 0.1, 0.0, 0.0]),   # closest to 0
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [-1.0, 0.0, 0.0, 0.0]),   # antipode of 0
]


def _emb(spark):
    return spark.createDataFrame(VECS, SCHEMA)


def test_cosine_topk_ordering(spark):
    emb = _emb(spark)
    out = (
        cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
        .orderBy("rank")
        .collect()
    )
    assert [r["nbr_id"] for r in out] == [1, 2, 3]
    assert out[0]["cosine"] > 0.99
    assert out[2]["cosine"] == -1.0
    assert all(r["nbr_id"] != 0 for r in out)  # self excluded


def test_lsh_agrees_on_nearest(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    exact = cosine_topk(emb, q, k=1).collect()[0]
    approx = lsh_cosine_topk(emb, q, dim=4, k=1, bits=4).collect()
    # vec 1 shares vec 0's bucket under any sign-LSH (cos ≈ 0.995)
    assert approx and approx[0]["nbr_id"] == exact["nbr_id"] == 1
