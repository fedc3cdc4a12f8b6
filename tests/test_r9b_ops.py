"""Round-9 second-batch operators: persisted histogram drift baselines
(histogram_index / histogram_index_merge / psi_from_histograms /
histogram_quantiles) and the ANN retrieval-quality report
(ann_recall_report).  Catalog twins: q225-q227."""

import math

import pyspark.sql.functions as F
import pytest

from streaming_feature_store_spark.operators.drift import (
    histogram_index,
    histogram_index_merge,
    histogram_quantiles,
    psi,
    psi_from_histograms,
)
from streaming_feature_store_spark.ml.ranking import ann_recall_report

SPECS = {"x": [10.0, 20.0, 30.0]}


def _rows(df):
    return {(r["feature"], r["bucket"]): r["n"] for r in df.collect()}


def test_histogram_index_buckets_and_null_exclusion(spark):
    df = spark.createDataFrame(
        [(5.0,), (10.0,), (19.9,), (25.0,), (30.0,), (99.0,), (None,)],
        "x double",
    )
    got = _rows(histogram_index(df, SPECS))
    # ladder: [<10]=1, [10,20)=2, [20,30)=1, [>=30]=2; NULL excluded
    assert got == {("x", 0): 1, ("x", 1): 2, ("x", 2): 1, ("x", 3): 2}


def test_histogram_index_emits_zero_buckets(spark):
    df = spark.createDataFrame([(15.0,)], "x double")
    got = _rows(histogram_index(df, SPECS))
    assert got == {("x", 0): 0, ("x", 1): 1, ("x", 2): 0, ("x", 3): 0}


def test_histogram_merge_equals_full_rebuild(spark):
    a = spark.createDataFrame([(float(v),) for v in range(0, 50, 3)], "x double")
    b = spark.createDataFrame([(float(v),) for v in range(1, 80, 7)], "x double")
    merged = _rows(
        histogram_index_merge(histogram_index(a, SPECS), histogram_index(b, SPECS))
    )
    full = _rows(histogram_index(a.unionByName(b), SPECS))
    assert merged == full


def test_psi_from_histograms_matches_inline_psi(spark):
    df = spark.createDataFrame(
        [(float(v % 37), v % 2 == 0) for v in range(200)], "x double, grp boolean"
    )
    edges = SPECS["x"]
    inline = psi(df, "x", "grp", edges).collect()[0]["psi"]
    he = histogram_index(df.filter(~F.col("grp")), SPECS)
    ha = histogram_index(df.filter(F.col("grp")), SPECS)
    viaidx = psi_from_histograms(he, ha).collect()[0]
    assert viaidx["feature"] == "x"
    assert math.isclose(viaidx["psi"], inline, abs_tol=2e-6)


def test_psi_from_histograms_empty_side_is_null(spark):
    df = spark.createDataFrame([(15.0,)], "x double")
    empty = spark.createDataFrame([], "x double")
    out = psi_from_histograms(
        histogram_index(empty, SPECS), histogram_index(df, SPECS)
    ).collect()[0]
    assert out["psi"] is None and out["n_expected"] == 0


def test_histogram_quantiles_interpolation_and_clamp(spark):
    # 10 values in [10,20), 10 in [20,30): median = edge 20 exactly,
    # p25 = 10 + (5/10)*10 = 15; p95 -> target 19 in bucket2:
    # 20 + (19-10)/10*10 = 29; p99 above all mid-bucket mass still in b2
    df = spark.createDataFrame(
        [(10.0 + i,) for i in range(10)] + [(20.0 + i,) for i in range(10)],
        "x double",
    )
    idx = histogram_index(df, SPECS)
    got = {
        (r["feature"], r["q"]): r["estimate"]
        for r in histogram_quantiles(idx, SPECS, [0.25, 0.5, 0.95]).collect()
    }
    assert got[("x", 0.25)] == 15.0
    assert got[("x", 0.5)] == 20.0
    assert got[("x", 0.95)] == 29.0


def test_histogram_quantiles_open_bucket_clamps_to_edge(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (99.0,)], "x double")
    got = {
        r["q"]: r["estimate"]
        for r in histogram_quantiles(
            histogram_index(df, SPECS), SPECS, [0.25, 0.99]
        ).collect()
    }
    # p25 straddles bucket 0 (below the first edge) -> pinned at edges[0]
    assert got[0.25] == 10.0
    # p99 straddles the open top bucket -> pinned at edges[-1]
    assert got[0.99] == 30.0


def _topk(spark, rows):
    return spark.createDataFrame(rows, "query_id long, nbr_id long, rank int")


def test_ann_recall_perfect_retrieval(spark):
    t = _topk(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)])
    r = ann_recall_report(t, t, k=2).collect()[0]
    assert r["recall_at_k"] == 1.0 and r["mrr_at_k"] == 1.0
    assert r["n_queries"] == 2 and r["n_truth_pairs"] == 4 and r["n_hits"] == 4


def test_ann_recall_partial_overlap_and_mrr_rank(spark):
    t = _topk(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 1), (2, 21, 2)])
    # q1: true nn at candidate rank 2, one truth item missed;
    # q2: candidates miss everything
    c = _topk(spark, [(1, 99, 1), (1, 10, 2), (2, 98, 1), (2, 97, 2)])
    r = ann_recall_report(t, c, k=2).collect()[0]
    assert r["n_hits"] == 1 and r["recall_at_k"] == 0.25
    assert math.isclose(r["mrr_at_k"], (0.5 + 0.0) / 2, abs_tol=1e-9)


def test_ann_recall_query_absent_from_candidates_counts_as_miss(spark):
    t = _topk(spark, [(1, 10, 1), (2, 20, 1)])
    c = _topk(spark, [(1, 10, 1)])
    r = ann_recall_report(t, c, k=1).collect()[0]
    assert r["n_queries"] == 2 and r["recall_at_k"] == 0.5
    assert math.isclose(r["mrr_at_k"], 0.5, abs_tol=1e-9)


def test_ann_recall_respects_k_cutoff(spark):
    t = _topk(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    c = _topk(spark, [(1, 11, 1), (1, 12, 2), (1, 10, 3)])
    # at k=2: truth {10,11}, candidates {11,12} -> 1 hit; true nn (10)
    # sits at candidate rank 3, outside k -> mrr 0
    r = ann_recall_report(t, c, k=2).collect()[0]
    assert r["n_hits"] == 1 and r["recall_at_k"] == 0.5
    assert r["mrr_at_k"] == 0.0
