"""Distributed ranking-quality metrics: NDCG@k, precision@k, recall@k.

The offline evaluation loop for any retrieval/recommendation surface the
feature store feeds (the reference scores pointwise fraud probabilities;
a recsys serving path is scored by RANKING quality instead).  Inputs are
(user, item, score, relevance) rows — score is the model's prediction,
relevance the observed outcome — and the metrics are per-user list
statistics averaged per group.

Everything is exact closed form over two per-user sort orders:

    DCG@k  = Σ_{i≤k} rel_(i) / log2(i + 1)      (ranked by score desc)
    IDCG@k = the same sum ranked by rel desc     (the ideal ordering)
    NDCG@k = DCG / IDCG                          (users with IDCG=0 skipped)
    P@k    = |{top-k with rel > 0}| / k
    R@k    = |{top-k with rel > 0}| / |{rel > 0}|

Scale shape: ONE hash shuffle on (group, user) feeds both window sorts
(score order and ideal order); per-user lists are catalog-bounded (a
user's candidate set), so no partition ever sees more than one user's
list per task sub-group.  The final per-group mean uses exact decimal
accumulation (order-independent).  Tie order is pinned by the item
column for cross-engine determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from streaming_feature_store_spark.functions.exprs import dsum


def ranking_metrics(
    df: DataFrame,
    group_cols: list[str],
    user_col: str,
    item_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-group mean NDCG@k / precision@k / recall@k over per-user
    ranked lists.  NULL scores rank last (unscored candidates); NULL
    relevance counts as 0.  Users whose lists contain no relevant item
    (IDCG = 0) are excluded from the NDCG mean and the user count —
    the standard convention (their ranking quality is undefined).
    """
    rel = F.coalesce(F.col(rel_col).cast("double"), F.lit(0.0))
    keys = [*group_cols, user_col]
    w_score = Window.partitionBy(*keys).orderBy(
        F.col(score_col).desc_nulls_last(), F.col(item_col)
    )
    w_ideal = Window.partitionBy(*keys).orderBy(
        rel.desc(), F.col(item_col)
    )
    ranked = df.select(
        *keys,
        rel.alias("_rel"),
        F.row_number().over(w_score).alias("_rk"),
        F.row_number().over(w_ideal).alias("_irk"),
    )
    # each discounted-gain term is cast to decimal(18,8) BEFORE the
    # per-user sum, so DCG/IDCG are exact order-independent decimal
    # accumulations (the dsum policy applied inside the list)
    disc = lambda r: (  # noqa: E731
        F.col("_rel") / F.log2(r + F.lit(1.0))
    ).cast("decimal(18,8)")
    per_user = ranked.groupBy(*keys).agg(
        F.sum(F.when(F.col("_rk") <= k, disc(F.col("_rk")))).alias("_dcg"),
        F.sum(
            F.when(F.col("_irk") <= k, disc(F.col("_irk")))
        ).alias("_idcg"),
        F.count(
            F.when((F.col("_rk") <= k) & (F.col("_rel") > 0), 1)
        ).alias("_hits"),
        F.count(F.when(F.col("_rel") > 0, 1)).alias("_nrel"),
    )
    scored = per_user.filter(F.col("_nrel") > 0).select(
        *group_cols,
        (
            F.col("_dcg").cast("double") / F.col("_idcg").cast("double")
        ).alias("_ndcg"),
        (F.col("_hits") / F.lit(float(k))).alias("_p"),
        (F.col("_hits") / F.col("_nrel")).alias("_r"),
    )
    n = F.count("*")
    return scored.groupBy(*group_cols).agg(
        n.alias("n_users"),
        F.round(dsum("_ndcg", 8) / n, 6).alias("ndcg_at_k"),
        F.round(dsum("_p", 8) / n, 6).alias("precision_at_k"),
        F.round(dsum("_r", 8) / n, 6).alias("recall_at_k"),
    )


def ann_recall_report(
    truth: DataFrame,
    candidates: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "nbr_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Index-quality eval for an approximate retrieval path against the
    exact ground truth — the report run before trusting an ANN index (or
    any cheapened retrieval: truncated dims, quantized vectors, fewer
    probes) for the 100 TB retrieval loop.

    Inputs are two (query, item, rank) top-k lists; output is ONE row:

    - ``recall_at_k``: micro-averaged |truth ∩ candidates| / |truth| over
      rows with rank <= k — integer counts, one division at the edge, so
      the number is exact and order-independent by construction;
    - ``mrr_at_k``: mean reciprocal rank AT WHICH the candidate list
      surfaces the TRUE nearest neighbor (truth rank 1); a miss counts 0.
      Reciprocal terms accumulate as decimals (order-independent sum).

    Scale shape: one equi-join on (query, item) for hits, one on
    (query, true-nn item) for MRR, both on already-tiny top-k frames
    (|queries| x k rows); the report is a single global aggregate.
    """
    t = truth.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    )
    c = candidates.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).alias("_crk"),
    )
    hits = t.join(c.select("_q", "_i"), ["_q", "_i"], "left_semi")
    nn1 = truth.filter(F.col(rank_col) == 1).select(
        F.col(query_col).alias("_q"), F.col(item_col).alias("_i")
    )
    rr = (
        nn1.join(c, ["_q", "_i"], "left")
        .select(
            F.coalesce(
                (F.lit(1.0) / F.col("_crk")).cast("decimal(18,12)"),
                F.lit(0).cast("decimal(18,12)"),
            ).alias("_rr")
        )
    )
    agg_t = t.agg(
        F.count("*").alias("n_truth_pairs"),
        F.countDistinct("_q").alias("n_queries"),
    )
    agg_h = hits.agg(F.count("*").alias("n_hits"))
    agg_r = rr.agg(
        F.sum("_rr").alias("_rr_sum"), F.count("*").alias("_n1")
    )
    return (
        agg_t.crossJoin(agg_h)
        .crossJoin(agg_r)
        .select(
            F.lit(k).alias("k"),
            "n_queries",
            "n_truth_pairs",
            "n_hits",
            F.round(
                F.col("n_hits") / F.col("n_truth_pairs").cast("double"), 6
            ).alias("recall_at_k"),
            F.round(
                (F.col("_rr_sum").cast("double"))
                / F.col("_n1").cast("double"),
                6,
            ).alias("mrr_at_k"),
        )
    )
