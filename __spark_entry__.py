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
# registration (dict-insertion) order.  Rounds 2-4 produced driver-green
# rows for every catalog query q01-q132 (r2: q01-q50; r3: q51-q82 plus 18
# re-verified; r4: q83-q132).  Round 5 promotes the 13 round-4 late
# additions that have never had a driver-recorded row — q133-q145
# (interval join, interpolation, weighted sampling, PageRank, behavior
# sequences, negative sampling, correlations, entropy, Benford, MI +
# Cramér's V association, CUSUM change point, two-view feature-service
# read, edit-distance fuzzy join) — plus 37 re-verification ballast rows
# chosen for complexity and for overlap with this round's code changes
# (negative-sample index rebuild, cooccurrence broadcast policy,
# priority-sample merge dedup, PageRank oracle node-count derivation).
# After this round every catalog query has a driver green row across
# r2+r3+r4+r5; the full catalog is additionally pinned per-round by the
# committed PARITY_sf0.01_r0N.txt runs.
_PRIORITY = [
    # round-4 late additions (13) — first driver-recorded verification
    "q133_post_purchase_activity", "q134_linear_interpolation",
    "q135_weighted_sample", "q136_nation_pagerank",
    "q137_user_event_sequences", "q138_negative_samples",
    "q139_feature_correlations", "q140_categorical_entropy",
    "q141_benford_digits", "q142_feature_association",
    "q143_cusum_changepoint", "q144_feature_service_read",
    "q145_fuzzy_name_pairs",
    # re-verification ballast (37): queries touching this round's changed
    # code paths first, then the most complex prior-green shapes
    "q119_brand_basket_lift", "q102_bigram_collocations",
    "q101_unigram_logprob", "q88_tfidf_top_terms",
    "q95_per_source_quota", "q112_sequence_packing",
    "q116_source_overlap", "q113_scd2_history",
    "q108_sketch_rollup", "q109_audience_overlap",
    "q110_kll_quantile_rollup", "q111_heavy_hitters",
    "q91_knn_label_agreement", "q96_next_click_after_purchase",
    "q104_iqr_outlier_gate", "q107_ordered_funnel_depth",
    "q114_winsorized_stats", "q115_value_histogram",
    "q117_cluster_cohesion", "q118_order_value_gini",
    "q122_session_bounce_rate", "q123_payload_stats",
    "q124_grouping_sets_stats", "q125_supplier_top_part",
    "q126_value_percent_rank", "q127_mad_by_group",
    "q128_locf_gap_fill", "q46_wide_feature_frame",
    "q39_minhash_near_dups", "q40_simhash_near_dups",
    "q57_embedding_near_dups", "q58_ivf_topk",
    "q67_dedup_clusters", "q61_curated_corpus",
    "q69_cluster_balanced_sample", "q14_asof_purchase_features",
    "q05_multi_horizon",
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
