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
# registration (dict-insertion) order.  Every catalog query has carried a
# driver-recorded green row at least once (union of CORRECTNESS_r01..r08 =
# 220/220), and the full catalog is re-pinned per round by the committed
# PARITY_sf0.01_r0N.txt runs on final HEAD.
# Round 9's window (r8 verdict item #3): the front slots carry this
# round's NEW and CHANGED code paths — the incremental-index family
# (q221-q224 dedup/IVF, q225 histogram drift baseline, q226 histogram
# quantiles, q228 distinct-cardinality index, q230 incremental
# sessionization, q231 incremental clusters, q232 trending index, q233 quantile-frozen PSI, q234 record linkage), the retrieval-recall report (q227), line-level
# corpus dedup (q229), plus the r9 guard/fix paths (q216
# proportions_ztest empty-arm guard, q217 stickiness zero-DAU gap
# days, q220 forecast tiebreak, q58 ivf_topk persistence refactor) —
# and the remaining 32 slots ROTATE THE LEGACY SPINE
# q01-q32 through the driver: those rows were last driver-checked on
# r2/r3-era HEADs, and with 234 queries and 50 slots the spine only
# re-pins via the committed parity artifact unless deliberately rotated
# back in (q33-q45 overflow to PARITY_sf0.01_r09.txt).
_PRIORITY = [
    # r9 new + changed code paths (18)
    "q221_incremental_minhash", "q222_incremental_exact_screen",
    "q223_incremental_neardup_screen", "q224_ivf_persisted_lifecycle",
    "q225_drift_baseline_index", "q226_histogram_quantiles",
    "q227_retrieval_recall", "q228_incremental_distinct",
    "q229_line_dedup", "q230_incremental_sessions",
    "q231_incremental_clusters", "q232_trending_parts",
    "q233_psi_quantile_binned", "q234_record_linkage",
    "q216_conversion_ztest",
    "q217_dau_stickiness", "q220_forecast_eval", "q58_ivf_topk",
    # legacy spine rotation (32): TPC-H-ish aggregates/joins/windows
    "q01_pricing_summary", "q02_user_window_stats_5m",
    "q03_user_sliding_5m_1m", "q04_time_since_last", "q05_multi_horizon",
    "q06_top_customers", "q07_event_type_mode", "q08_user_sessions",
    "q09_user_type_ratios", "q10_value_zscore", "q11_rolling_last_100",
    "q12_engagement_score", "q13_event_flags",
    "q14_asof_purchase_features", "q15_revenue_by_nation",
    "q16_union_activity", "q17_market_segment_stats",
    "q18_order_priority", "q19_doc_token_stats", "q20_doc_quality",
    "q21_exact_dup_groups", "q22_jaccard_near_dups",
    "q23_lang_source_stats", "q24_lang_id", "q25_cosine_topk",
    "q26_psi_drift", "q27_ks_drift", "q28_chi2_drift",
    "q29_daily_rollup", "q30_hourly_histogram",
    "q31_asof_order_enrichment", "q32_user_value_stddev",
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
