"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (multi-horizon per-entity feature frame)
on sf0.001. ``queries()`` — the full catalog from
streaming_feature_store_spark.plans.queries (one entry per SURVEY.md §2
operator family). ``oracle_sql()`` — DuckDB twins for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _catalog():
    from streaming_feature_store_spark.plans.queries import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the wide per-event feature frame — multi-horizon counts,
    lag, rolling mean, z-score and scalar flags in one windowed pass (the
    Spark restatement of the reference's per-event feature computation)."""
    qs, _ = _catalog()
    return qs["q46_wide_feature_frame"](spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 entries of queries() in
# registration (dict-insertion) order.  Rounds 2+3 produced driver-green rows
# for q01-q82 (r2: q01-q50; r3: q51-q82 plus 18 re-verified r2 queries).
# Round 4 promotes q83-q111 — the 29 late round-3 additions (TPC-H shapes,
# corpus stats, sketches, forward as-of, attribution, funnel) that until now
# were green only in the judge's out-of-band check_parity run — padded with 21
# already-green ballast queries, including the six (q01,q02,q07,q35,q42,q49)
# that rotated out of the r3 window (ADVICE.md r3, low #5).  After this round
# every catalog query has a driver-recorded green row across r2+r3+r4.
_PRIORITY = [
    # round-3 late additions (29) — first driver-recorded verification
    "q83_inactive_high_balance", "q84_order_count_distribution",
    "q85_brand_revenue_share", "q86_top_supplier_revenue",
    "q87_large_orders", "q88_tfidf_top_terms",
    "q89_min_unit_price_supplier", "q90_event_transitions",
    "q91_knn_label_agreement", "q92_rolling_distinct_users",
    "q93_new_vs_returning", "q94_column_profile",
    "q95_per_source_quota", "q96_next_click_after_purchase",
    "q97_regional_supplier_revenue", "q98_returned_items_customers",
    "q99_supplier_nation_year_revenue", "q100_disjunctive_predicates",
    "q101_unigram_logprob", "q102_bigram_collocations",
    "q103_first_touch_attribution", "q104_iqr_outlier_gate",
    "q105_market_share", "q106_value_decile_lift",
    "q107_ordered_funnel_depth", "q108_sketch_rollup",
    "q109_audience_overlap", "q110_kll_quantile_rollup",
    "q111_heavy_hitters",
    # ballast (21): the six rotated out of the r3 window + complex re-verifies
    "q01_pricing_summary", "q02_user_window_stats_5m", "q07_event_type_mode",
    "q35_user_hour_profile", "q42_out_of_order_stats", "q49_rollup_revenue",
    "q05_multi_horizon", "q08_user_sessions", "q14_asof_purchase_features",
    "q39_minhash_near_dups", "q40_simhash_near_dups", "q46_wide_feature_frame",
    "q53_ks_by_feature", "q54_ks_drift_report", "q57_embedding_near_dups",
    "q58_ivf_topk", "q60_dedup_survivors", "q61_curated_corpus",
    "q63_repetition_stats", "q66_pii_redaction", "q67_dedup_clusters",
]


def _reordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update({k: v for k, v in mapping.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs, _ = _catalog()
    return _reordered(qs)


def oracle_sql() -> dict[str, str]:
    _, oracles = _catalog()
    return _reordered(oracles)
