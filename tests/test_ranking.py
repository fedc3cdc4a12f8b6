"""ml/ranking.py pinned to a hand-computed NDCG example and structural
invariants."""

import math


def _dcg(rels):
    return sum(r / math.log2(i + 2) for i, r in enumerate(rels))


def test_ranking_metrics_hand_example(spark):
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    # one user, 5 items; scores rank items a>b>c>d>e; relevance says the
    # true order is c(3) > a(2) > e(1), b and d irrelevant
    rows = [
        ("g", 1, "a", 5.0, 2.0),
        ("g", 1, "b", 4.0, 0.0),
        ("g", 1, "c", 3.0, 3.0),
        ("g", 1, "d", 2.0, 0.0),
        ("g", 1, "e", 1.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "grp string, uid long, item string, score double, rel double"
    )
    r = ranking_metrics(
        df, ["grp"], "uid", "item", "score", "rel", k=3
    ).collect()[0]
    dcg = _dcg([2.0, 0.0, 3.0])  # top-3 by score: a, b, c
    idcg = _dcg([3.0, 2.0, 1.0])  # ideal: c, a, e
    assert math.isclose(r["ndcg_at_k"], round(dcg / idcg, 6), abs_tol=2e-6)
    assert r["precision_at_k"] == round(2 / 3, 6)  # a, c relevant in top-3
    assert r["recall_at_k"] == round(2 / 3, 6)  # 2 of 3 relevant found
    assert r["n_users"] == 1


def test_ranking_metrics_perfect_and_worst(spark):
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    # user 1: scores agree with relevance -> NDCG 1; user 2: inverted
    rows = []
    for i, (s, rel) in enumerate([(5.0, 5.0), (4.0, 4.0), (3.0, 3.0)]):
        rows.append(("g", 1, f"i{i}", s, rel))
    for i, (s, rel) in enumerate([(5.0, 1.0), (4.0, 2.0), (3.0, 5.0)]):
        rows.append(("g", 2, f"i{i}", s, rel))
    df = spark.createDataFrame(
        rows, "grp string, uid long, item string, score double, rel double"
    )
    got = ranking_metrics(
        df, ["grp"], "uid", "item", "score", "rel", k=3
    ).collect()[0]
    # user1 ndcg = 1.0; user2: dcg = 1/1 + 2/log2(3) + 5/2,
    # idcg = 5/1 + 2/log2(3) + 1/2
    u2 = _dcg([1.0, 2.0, 5.0]) / _dcg([5.0, 2.0, 1.0])
    assert math.isclose(got["ndcg_at_k"], round((1.0 + u2) / 2, 6),
                        abs_tol=2e-6)
    # all items relevant -> precision 1 for both
    assert got["precision_at_k"] == 1.0


def test_ranking_metrics_skips_users_without_relevance(spark):
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    rows = [
        ("g", 1, "a", 2.0, 1.0),
        ("g", 2, "a", 2.0, 0.0),  # no relevant items -> excluded
        ("g", 2, "b", 1.0, None),  # NULL rel counts as 0
    ]
    df = spark.createDataFrame(
        rows, "grp string, uid long, item string, score double, rel double"
    )
    r = ranking_metrics(
        df, ["grp"], "uid", "item", "score", "rel", k=2
    ).collect()[0]
    assert r["n_users"] == 1 and r["ndcg_at_k"] == 1.0


def test_ranking_metrics_null_scores_rank_last(spark):
    from streaming_feature_store_spark.ml.ranking import ranking_metrics

    rows = [
        ("g", 1, "a", None, 5.0),  # relevant but unscored
        ("g", 1, "b", 1.0, 0.0),
        ("g", 1, "c", 0.5, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "grp string, uid long, item string, score double, rel double"
    )
    r = ranking_metrics(
        df, ["grp"], "uid", "item", "score", "rel", k=2
    ).collect()[0]
    # the only relevant item fell outside top-2 -> precision/recall 0
    assert r["precision_at_k"] == 0.0 and r["recall_at_k"] == 0.0
    assert r["ndcg_at_k"] == 0.0
