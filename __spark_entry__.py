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
# registration (dict-insertion) order.  After r2-r5 every one of the 145
# catalog queries carries a driver-recorded green row; the full catalog
# is additionally pinned per-round by the committed
# PARITY_sf0.01_r0N.txt runs (r6's: 145/145 OK).  Round 6's window
# front-loads the queries over this round's CHANGED code paths —
# negative_sample's dropped index broadcast + localCheckpointed ranking
# (q138), source_overlap's exact hot-shingle cap (q116),
# dedup_clusters' self-pair-consistent union-find (q67), the winnowing
# kernel now property-pinned (q59/q72), the as-of machinery newly wired
# into the recsys demo (q14/q31/q96/q144), and the shared _shingle_index
# consumers (q22/q39/q40/q57) — then rotates in the OLDEST-verified
# ballast: r2/r3-era rows (q01-q38 block) whose last driver check
# predates the r4/r5 windows.
_PRIORITY = [
    # this round's changed code paths (15)
    "q138_negative_samples", "q116_source_overlap",
    "q67_dedup_clusters", "q144_feature_service_read",
    "q14_asof_purchase_features", "q31_asof_order_enrichment",
    "q96_next_click_after_purchase", "q135_weighted_sample",
    "q136_nation_pagerank", "q59_winnow_fingerprints",
    "q72_winnow_containment_pairs", "q22_jaccard_near_dups",
    "q39_minhash_near_dups", "q40_simhash_near_dups",
    "q57_embedding_near_dups",
    # oldest-verified ballast (32): last driver-checked in r2/r3
    "q01_pricing_summary", "q02_user_window_stats_5m",
    "q03_user_sliding_5m_1m", "q04_time_since_last",
    "q06_top_customers", "q07_event_type_mode",
    "q08_user_sessions", "q09_user_type_ratios",
    "q10_value_zscore", "q11_rolling_last_100",
    "q12_engagement_score", "q13_event_flags",
    "q15_revenue_by_nation", "q16_union_activity",
    "q17_market_segment_stats", "q18_order_priority",
    "q19_doc_token_stats", "q20_doc_quality",
    "q21_exact_dup_groups", "q23_lang_source_stats",
    "q24_lang_id", "q25_cosine_topk",
    "q26_psi_drift", "q27_ks_drift",
    "q28_chi2_drift", "q29_daily_rollup",
    "q30_hourly_histogram", "q32_user_value_stddev",
    "q33_risk_ladder", "q34_profile_default_fill",
    "q35_user_hour_profile",
    "q37_same_type_affinity",
    # round-6 additions — first driver-recorded verification
    "q146_data_quality_report", "q147_returnflag_price_regression",
    "q148_decay_attribution",
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
