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
# driver-recorded green row at least once (union of CORRECTNESS_r01..r09 =
# 234/234, checked name-by-name by the r9 judge), and the full catalog is
# re-pinned per round by the committed PARITY_sf0.01_r0N.txt runs on final
# HEAD.
# Round 11's window (r10 verdict item #4): front slots carry this round's
# NEW paths (q242 BM25 over the EXECUTABLE bucketed postings layout —
# save/load_postings_index with the co-located zero-Exchange dl join;
# q243 incremental eval-set decontamination over a persisted hit index)
# and the r11 CHANGED paths (q229/q239: the boilerplate anti-join lost
# its forced broadcast hint per the AQE-gate policy, VERDICT r10 #1;
# q237: bm25_from_index grew the doc_lengths split-table input; q235/
# q236/q238: the from-index scorers grew the validate contract guard,
# ADVICE r10); the remaining slots ROTATE THE NEXT LEGACY COHORT
# q71-q111 through the driver (last pinned on r4-r6-era HEADs; q112
# overflows to PARITY_sf0.01_r11.txt).
_PRIORITY = [
    # r11 new + changed code paths (9) — cheap changed paths first so the
    # heavy self-contained lifecycle queries (q242/q244) hit a warm JVM
    "q229_line_dedup", "q239_incremental_line_dedup",
    "q235_incremental_tfidf", "q236_incremental_lm_quality",
    "q238_incremental_dsir", "q237_bm25_from_index",
    "q243_incremental_decontamination",
    "q242_bm25_persisted_layout", "q244_daily_ingest_lifecycle",
    # legacy cohort rotation (42)
    "q71_parts_never_bulk_shipped", "q72_winnow_containment_pairs",
    "q73_small_quantity_revenue", "q74_latest_features_per_user",
    "q75_cube_revenue", "q76_nation_trade_flows",
    "q77_event_type_hour_pivot", "q78_solely_late_suppliers",
    "q79_weekly_retention", "q80_churned_purchasers",
    "q81_approx_percentiles", "q82_json_props_stats",
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
    "q111_heavy_hitters", "q112_sequence_packing",
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
