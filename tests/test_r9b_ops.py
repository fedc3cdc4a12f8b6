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


# --- distinct_index_merge (q228) -------------------------------------------

from streaming_feature_store_spark.operators.profile import (
    distinct_index_merge,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k string, u long, h int")


def test_distinct_index_merge_counts_and_novelty(spark):
    base = _ev(spark, [("a", 1, 0), ("a", 2, 0), ("b", 1, 5)])
    idx = base.distinct()
    delta = _ev(
        spark,
        [("a", 1, 0),  # seen
         ("a", 1, 1),  # new cell: same user, new hour
         ("a", 3, 0),  # new user
         ("a", 3, 0)], # duplicate within delta
    )
    report, updated = distinct_index_merge(delta, idx, ["k"], ["u", "h"])
    got = {r["k"]: (r["n_distinct"], r["n_new"]) for r in report.collect()}
    assert got == {"a": (4, 2), "b": (1, 0)}
    assert updated.count() == 5
    assert updated.distinct().count() == 5  # duplicate-free by construction


def test_distinct_index_merge_idempotent_reingest(spark):
    base = _ev(spark, [("a", 1, 0)]).distinct()
    delta = _ev(spark, [("a", 2, 3)])
    _, updated = distinct_index_merge(delta, base, ["k"], ["u", "h"])
    report2, updated2 = distinct_index_merge(delta, updated, ["k"], ["u", "h"])
    got = {r["k"]: (r["n_distinct"], r["n_new"]) for r in report2.collect()}
    assert got == {"a": (2, 0)}
    assert updated2.count() == 2


def test_distinct_index_merge_null_tuples_idempotent(spark):
    base = spark.createDataFrame(
        [("a", None, 0)], "k string, u long, h int"
    ).distinct()
    delta = spark.createDataFrame(
        [("a", None, 0), ("a", None, None)], "k string, u long, h int"
    )
    report, updated = distinct_index_merge(delta, base, ["k"], ["u", "h"])
    got = {r["k"]: (r["n_distinct"], r["n_new"]) for r in report.collect()}
    # (a,NULL,0) already indexed -> not new; (a,NULL,NULL) is new once
    assert got == {"a": (2, 1)}
    # re-merge: nothing new, index stable
    report2, updated2 = distinct_index_merge(delta, updated, ["k"], ["u", "h"])
    assert {r["k"]: r["n_new"] for r in report2.collect()} == {"a": 0}
    assert updated2.count() == 2


def test_distinct_index_merge_equals_full_recompute(spark):
    import random

    rng = random.Random(7)
    rows = [(rng.choice("abc"), rng.randrange(6), rng.randrange(4))
            for _ in range(300)]
    df = _ev(spark, rows)
    base = df.limit(200)
    delta = spark.createDataFrame(rows[200:], "k string, u long, h int")
    idx = base.select("k", "u", "h").distinct()
    report, updated = distinct_index_merge(delta, idx, ["k"], ["u", "h"])
    full = (
        base.unionByName(delta).select("k", "u", "h").distinct()
        .groupBy("k").count()
    )
    want = {r["k"]: r["count"] for r in full.collect()}
    assert {r["k"]: r["n_distinct"] for r in report.collect()} == want
    assert updated.count() == sum(want.values())


# --- line_dedup (q229) ------------------------------------------------------

from streaming_feature_store_spark.operators.text import line_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_dedup_strips_corpus_boilerplate(spark):
    d = _docs(
        spark,
        [
            (1, "cookie banner\nunique one\nfooter"),
            (2, "cookie banner\nunique two\nfooter"),
            (3, "all original\ncontent here"),
        ],
    )
    got = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert got[1]["clean_text"] == "unique one"
    assert got[2]["clean_text"] == "unique two"
    assert got[3]["clean_text"] == "all original\ncontent here"
    assert got[1]["n_lines"] == 3 and got[1]["n_kept"] == 1
    assert got[3]["kept_frac"] == 1.0


def test_line_dedup_preserves_order_and_empties_fully_duped_doc(spark):
    d = _docs(
        spark,
        [
            (1, "z common\na common"),
            (2, "a common\nz common\nmiddle\nz common"),
            (3, "z common\nmine"),
        ],
    )
    got = {r["doc_id"]: r for r in line_dedup(d).collect()}
    # doc 1 is ALL boilerplate -> empty but present
    assert got[1]["clean_text"] == "" and got[1]["n_kept"] == 0
    assert got[1]["kept_frac"] == 0.0
    # doc 2 keeps only 'middle', original position order
    assert got[2]["clean_text"] == "middle"
    # repeated line within ONE doc (z common x2 in doc 2) counts docs, not rows
    assert got[3]["clean_text"] == "mine"


def test_line_dedup_within_doc_repeat_not_boilerplate(spark):
    # a line repeated 3x inside a single doc appears in only ONE distinct
    # doc -> kept (corpus screen, not intra-doc compression)
    d = _docs(spark, [(1, "same\nsame\nsame"), (2, "other")])
    got = {r["doc_id"]: r for r in line_dedup(d).collect()}
    assert got[1]["clean_text"] == "same\nsame\nsame"
    assert got[1]["kept_frac"] == 1.0


def test_line_dedup_min_docs_threshold(spark):
    d = _docs(spark, [(1, "x\ny"), (2, "x\nz"), (3, "x\nw")])
    loose = {r["doc_id"]: r for r in line_dedup(d, min_docs=4).collect()}
    assert all(r["kept_frac"] == 1.0 for r in loose.values())
    tight = {r["doc_id"]: r for r in line_dedup(d, min_docs=3).collect()}
    assert tight[1]["clean_text"] == "y"  # only 'x' crosses the 3-doc bar


def test_line_dedup_lines_col_override(spark):
    d = _docs(spark, [(1, "a b c d"), (2, "a b x y")])
    d2 = d.withColumn("_w", F.split("text", " "))
    got = {
        r["doc_id"]: r
        for r in line_dedup(d2, lines_col="_w", line_sep=" ").collect()
    }
    # words 'a' and 'b' appear in both docs -> stripped
    assert got[1]["clean_text"] == "c d"
    assert got[2]["clean_text"] == "x y"


# --- session_index_merge (q230) ----------------------------------------------

import datetime as dt

from streaming_feature_store_spark.operators.sessions import (
    session_index_merge,
    sessionize,
)

_B = dt.datetime(2024, 1, 1, 0, 0, 0)
_CUT = "2024-01-02 00:00:00"


def _events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _sess_set(df):
    return {
        (r["user_id"], r["n_events"], r["session_start_us"],
         r["session_end_us"])
        for r in df.collect()
    }


def _merge_vs_full(spark, base_rows, delta_rows, gap="30 minutes"):
    base = _events(spark, base_rows)
    delta = _events(spark, delta_rows)
    idx = sessionize(base, "user_id", gap=gap)
    merged = session_index_merge(delta, idx, _CUT, "user_id", gap=gap)
    full = sessionize(base.unionByName(delta), "user_id", gap=gap)
    assert _sess_set(merged) == _sess_set(full)
    return merged


def test_session_merge_extends_open_session(spark):
    # base session ends 23:50; delta event 00:10 is 20min later -> same session
    base = [(1, _B + dt.timedelta(hours=23, minutes=m)) for m in (40, 50)]
    delta = [(1, dt.datetime(2024, 1, 2, 0, 10))]
    merged = _merge_vs_full(spark, base, delta)
    assert merged.count() == 1 and merged.collect()[0]["n_events"] == 3


def test_session_merge_closed_sessions_untouched_and_new_entity(spark):
    base = [
        (1, _B + dt.timedelta(hours=1)),        # closed long ago
        (1, _B + dt.timedelta(hours=1, minutes=5)),
        (2, _B + dt.timedelta(hours=23, minutes=55)),  # open at cutoff
    ]
    delta = [
        (2, dt.datetime(2024, 1, 2, 0, 5)),   # extends user 2
        (3, dt.datetime(2024, 1, 2, 9, 0)),   # brand-new entity
    ]
    merged = _merge_vs_full(spark, base, delta)
    got = {(r["user_id"], r["n_events"]) for r in merged.collect()}
    assert got == {(1, 2), (2, 2), (3, 1)}


def test_session_merge_gap_boundary_semantics(spark):
    # F.session_window windows are END-INCLUSIVE (verified empirically):
    # an event EXACTLY one gap after the open session's end still merges;
    # one microsecond past it starts a new session.  The merge must agree
    # with sessionize on both sides of the boundary.
    base = [(1, _B + dt.timedelta(hours=23, minutes=45))]
    exact = [(1, dt.datetime(2024, 1, 2, 0, 15))]  # diff = exactly 30min
    merged = _merge_vs_full(spark, base, exact)
    assert merged.count() == 1
    past = [(1, dt.datetime(2024, 1, 2, 0, 15, 0, 1))]  # gap + 1us
    merged2 = _merge_vs_full(spark, base, past)
    assert merged2.count() == 2


def test_session_merge_entity_with_no_delta_events_passes_through(spark):
    base = [(7, _B + dt.timedelta(hours=23, minutes=59))]  # open, no delta
    delta = [(8, dt.datetime(2024, 1, 2, 1, 0))]
    merged = _merge_vs_full(spark, base, delta)
    assert merged.count() == 2


def test_session_merge_delta_chains_multiple_new_sessions(spark):
    delta = [
        (1, dt.datetime(2024, 1, 2, 0, 0)),
        (1, dt.datetime(2024, 1, 2, 0, 10)),
        (1, dt.datetime(2024, 1, 2, 2, 0)),
        (1, dt.datetime(2024, 1, 2, 2, 20)),
        (1, dt.datetime(2024, 1, 2, 2, 45)),
    ]
    merged = _merge_vs_full(spark, [(1, _B)], delta)
    counts = sorted(r["n_events"] for r in merged.collect())
    assert counts == [1, 2, 3]


def test_session_merge_random_corpus_equals_full_recompute(spark):
    import random

    rng = random.Random(42)
    base = [
        (rng.randrange(6),
         _B + dt.timedelta(minutes=rng.randrange(0, 1440)))
        for _ in range(120)
    ]
    delta = [
        (rng.randrange(8),
         dt.datetime(2024, 1, 2) + dt.timedelta(minutes=rng.randrange(0, 600)))
        for _ in range(80)
    ]
    _merge_vs_full(spark, base, delta, gap="45 minutes")


def test_session_merge_validates_contract(spark):
    base = [(1, _B + dt.timedelta(hours=5))]
    idx = sessionize(_events(spark, base), "user_id")
    late_delta = _events(spark, [(1, _B + dt.timedelta(hours=6))])  # pre-cutoff!
    with pytest.raises(ValueError, match="before cutoff"):
        session_index_merge(late_delta, idx, _CUT, "user_id")
    # index built past the cutoff is rejected too
    post_idx = sessionize(
        _events(spark, [(1, dt.datetime(2024, 1, 2, 3, 0))]), "user_id"
    )
    ok_delta = _events(spark, [(1, dt.datetime(2024, 1, 2, 5, 0))])
    with pytest.raises(ValueError, match="after cutoff"):
        session_index_merge(ok_delta, post_idx, _CUT, "user_id")


def test_session_merge_boundary_tie_is_allowed(spark):
    # An indexed session ENDING exactly at the cutoff (same-microsecond
    # tie with the delta's first event — realistic when a streaming sink
    # derives cutoff = batch min ts) must NOT fail-stop: the tie
    # gap-merges with gap 0 exactly as a full recompute would (ADVICE r9).
    tie = dt.datetime(2024, 1, 2, 0, 0)  # == _CUT
    base = [(1, _B + dt.timedelta(hours=23, minutes=50)), (1, tie)]
    delta = [(1, tie), (1, dt.datetime(2024, 1, 2, 0, 20))]
    merged = _merge_vs_full(spark, base, delta)
    assert merged.count() == 1 and merged.collect()[0]["n_events"] == 4


# --- cluster_index_merge (q231) ----------------------------------------------

from streaming_feature_store_spark.operators.dedup import (
    cluster_index_merge,
    dedup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _labels(df):
    return {(r["node"], r["cluster_id"]) for r in df.collect()}


def _merge_vs_full_cc(spark, base_edges, delta_edges):
    base = _pairs(spark, base_edges)
    delta = _pairs(spark, delta_edges)
    idx = dedup_clusters(base)
    merged = cluster_index_merge(delta, idx)
    full = dedup_clusters(base.unionByName(delta))
    assert _labels(merged) == _labels(full)
    return merged


def test_cluster_merge_bridges_two_components(spark):
    merged = _merge_vs_full_cc(
        spark, [(1, 2), (10, 11)], [(2, 10)]
    )
    got = _labels(merged)
    assert got == {(1, 1), (2, 1), (10, 1), (11, 1)}


def test_cluster_merge_new_singleton_component(spark):
    merged = _merge_vs_full_cc(spark, [(1, 2)], [(50, 60)])
    assert _labels(merged) == {(1, 1), (2, 1), (50, 50), (60, 50)}


def test_cluster_merge_edge_within_existing_component_is_noop(spark):
    base = [(1, 2), (2, 3)]
    merged = _merge_vs_full_cc(spark, base, [(1, 3)])
    assert _labels(merged) == {(1, 1), (2, 1), (3, 1)}


def test_cluster_merge_chain_across_three_components(spark):
    # delta edges chain components {1,2}, {10,11}, {20,21} through a NEW
    # node 99 -> all collapse to min id 1
    merged = _merge_vs_full_cc(
        spark,
        [(1, 2), (10, 11), (20, 21)],
        [(2, 99), (99, 10), (99, 20)],
    )
    labels = dict(_labels(merged))
    assert set(labels.values()) == {1} and labels[99] == 1


def test_cluster_merge_new_node_becomes_representative(spark):
    # delta introduces node 0 (< all existing ids) attached to {5,6}
    merged = _merge_vs_full_cc(spark, [(5, 6)], [(0, 6)])
    assert _labels(merged) == {(0, 0), (5, 0), (6, 0)}


def test_cluster_merge_random_graph_equals_full_recompute(spark):
    import random

    rng = random.Random(17)
    base = [
        (rng.randrange(40), rng.randrange(40)) for _ in range(50)
    ]
    base = [(a, b) for a, b in base if a != b]
    delta = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(30)
    ]
    delta = [(a, b) for a, b in delta if a != b]
    _merge_vs_full_cc(spark, base, delta)


# --- trending daily-count index (q232) ---------------------------------------

from streaming_feature_store_spark.operators.behavior import (
    daily_count_index,
    daily_count_index_merge,
    decayed_topk,
)


def _items(spark, rows):
    return spark.createDataFrame(rows, "item long, day date")


def test_daily_count_index_merge_equals_full(spark):
    import datetime as dtm

    d = dtm.date(2024, 1, 1)
    base = _items(spark, [(1, d), (1, d), (2, d)])
    delta = _items(
        spark, [(1, d), (2, dtm.date(2024, 1, 2)), (3, dtm.date(2024, 1, 2))]
    )
    merged = daily_count_index_merge(
        daily_count_index(base, "item", "day"),
        daily_count_index(delta, "item", "day"),
    )
    full = daily_count_index(base.unionByName(delta), "item", "day")
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def test_daily_count_retention_evicts_old_days(spark):
    import datetime as dtm

    idx = daily_count_index(
        _items(
            spark,
            [(1, dtm.date(2024, 1, 1)), (1, dtm.date(2024, 3, 1)),
             (2, dtm.date(2023, 12, 1))],
        ),
        "item",
        "day",
    )
    kept = daily_count_index_merge(
        idx, idx.limit(0), retain_days=45, ref_day="2024-03-01"
    )
    days = {r["day"].isoformat() for r in kept.collect()}
    assert days == {"2024-03-01"}  # jan 1 and dec 1 are past the horizon
    with pytest.raises(ValueError, match="ref_day"):
        daily_count_index_merge(idx, idx.limit(0), retain_days=45)


def test_decayed_topk_weights_and_rank(spark):
    import datetime as dtm
    import math

    # item 1: 4 hits 30 days ago (weight 4*0.5=2); item 2: 3 hits today
    # (weight 3) -> item 2 ranks first despite fewer total hits
    idx = spark.createDataFrame(
        [(1, dtm.date(2024, 1, 1), 4), (2, dtm.date(2024, 1, 31), 3)],
        "item long, day date, n long",
    )
    got = {r["item"]: r for r in
           decayed_topk(idx, "2024-01-31", k=5, half_life_days=30.0).collect()}
    assert got[2]["rank"] == 1 and got[1]["rank"] == 2
    assert math.isclose(got[1]["decayed_weight"], 2.0, abs_tol=1e-6)
    assert got[2]["decayed_weight"] == 3.0
    assert got[1]["n_total"] == 4


def test_decayed_topk_k_cutoff_and_tiebreak(spark):
    import datetime as dtm

    d = dtm.date(2024, 1, 31)
    idx = spark.createDataFrame(
        [(i, d, 1) for i in range(10)], "item long, day date, n long"
    )
    got = decayed_topk(idx, "2024-01-31", k=3).collect()
    # all weights tie at 1.0 -> item id breaks ties ascending
    assert [r["item"] for r in sorted(got, key=lambda r: r["rank"])] == [0, 1, 2]


# --- quantile_edges / psi_quantile_binned (q233) -----------------------------

from streaming_feature_store_spark.operators.drift import (
    psi_quantile_binned,
    quantile_edges,
)


def test_quantile_edges_exact_targets(spark):
    # 1..100 uniform: decile edge_i = smallest v with cum >= ceil(i*100/10)
    # = exactly 10i
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    got = {r["i"]: r["edge"] for r in quantile_edges(df, "x", 10).collect()}
    assert got == {i: 10.0 * i for i in range(1, 10)}


def test_quantile_edges_integer_target_no_fp_ceil(spark):
    # N=10000, i=3: float 0.3*10000 = 3000.0000000000005 would ceil to
    # 3001; the integer form (3*10000+9) div 10 = 3001? no: 30009//10 =
    # 3000 (ceil(30000/10)=3000) -> edge is the 3000th value
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 10001)], "x double"
    )
    got = {r["i"]: r["edge"] for r in quantile_edges(df, "x", 10).collect()}
    assert got[3] == 3000.0


def test_quantile_edges_skip_nulls_and_ties(spark):
    # heavy ties: 50x 1.0, 50x 2.0 -> median edge = 1.0 (cum 50 >= 50)
    rows = [(1.0,)] * 50 + [(2.0,)] * 50 + [(None,)] * 10
    df = spark.createDataFrame(rows, "x double")
    got = {r["i"]: r["edge"] for r in quantile_edges(df, "x", 2).collect()}
    assert got == {1: 1.0}


def test_psi_quantile_binned_self_is_zero_and_shift_positive(spark):
    # (i // 50) % 2 alternates WHOLE 0..49 cycles between the groups, so
    # both populations carry the identical value multiset (i % 2 would
    # hand evens to one group and odds to the other)
    same = spark.createDataFrame(
        [(float(i % 50), (i // 50) % 2 == 0) for i in range(400)],
        "x double, grp boolean",
    )
    assert psi_quantile_binned(same, "x", "grp").collect()[0]["psi"] == 0.0
    shifted = spark.createDataFrame(
        [(float(i % 50), False) for i in range(400)]
        + [(float(i % 50) + 25.0, True) for i in range(400)],
        "x double, grp boolean",
    )
    assert psi_quantile_binned(shifted, "x", "grp").collect()[0]["psi"] > 0.5


# --- erase_from_cluster_index ------------------------------------------------

from streaming_feature_store_spark.operators.dedup import (
    erase_from_cluster_index,
)


def _erase_vs_rebuild(spark, edge_rows, erase_ids):
    pairs = _pairs(spark, edge_rows)
    labels = dedup_clusters(pairs)
    er = spark.createDataFrame([(i,) for i in erase_ids], "node long")
    got = erase_from_cluster_index(labels, pairs, er)
    kept = [
        (a, b) for a, b in edge_rows
        if a not in erase_ids and b not in erase_ids
    ]
    want = dedup_clusters(_pairs(spark, kept)) if kept else None
    want_set = _labels(want) if want is not None else set()
    assert _labels(got) == want_set
    return dict(_labels(got))


def test_erase_bridge_node_splits_component(spark):
    # 1-2-9-10 chained through bridge 5: erasing 5 splits {1,2} and {9,10}
    got = _erase_vs_rebuild(spark, [(1, 2), (2, 5), (5, 9), (9, 10)], {5})
    assert got == {1: 1, 2: 1, 9: 9, 10: 9}


def test_erase_representative_promotes_new_min(spark):
    # rep of {1,2,3} is 1; erasing 1 leaves {2,3} with rep 2
    got = _erase_vs_rebuild(spark, [(1, 2), (2, 3)], {1})
    assert got == {2: 2, 3: 2}


def test_erase_leaves_unrelated_components_untouched(spark):
    got = _erase_vs_rebuild(
        spark, [(1, 2), (50, 60), (60, 70)], {2}
    )
    # {1,2} loses its only edge entirely (1 drops out like a rebuild);
    # {50,60,70} must be byte-identical
    assert got == {50: 50, 60: 50, 70: 50}


def test_erase_random_graph_equals_rebuild(spark):
    import random

    rng = random.Random(23)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(40)]
    edges = [(a, b) for a, b in edges if a != b]
    _erase_vs_rebuild(spark, edges, {3, 7, 11})


# --- blocked_link (q234) ------------------------------------------------------

from streaming_feature_store_spark.operators.enrich import blocked_link


def test_blocked_link_best_match_and_unmatched(spark):
    master = spark.createDataFrame(
        [(1, "red widget", "B1", 10), (2, "red gadget", "B1", 10),
         (3, "blue bolt", "B2", 5)],
        "p_id long, name string, brand string, size int",
    )
    probe = spark.createDataFrame(
        [(100, "red widgex", "B1", 10),   # 1 edit from id 1
         (101, "zzzzzzzzzz", "B1", 10),   # no good match
         (102, "blue bolt", "B9", 5)],    # brand blocks it out entirely
        "f_id long, name string, brand string, size int",
    )
    sim = 1.0 - F.levenshtein("name", "m_name") / F.greatest(
        F.length("name"), F.length("m_name")
    ).cast("double")
    got = {
        r["f_id"]: (r["matched_id"], r["match_score"])
        for r in blocked_link(
            probe, master, on=["brand"], probe_id="f_id",
            master_id="p_id", score=sim, min_score=0.5,
            band_col="size", band=1,
        ).collect()
    }
    assert got[100][0] == 1 and got[100][1] == 0.9
    assert got[101] == (None, None)
    assert got[102] == (None, None)
    assert len(got) == 3  # every probe row present


def test_blocked_link_band_and_tiebreak(spark):
    master = spark.createDataFrame(
        [(5, "same name", "B", 10), (4, "same name", "B", 11),
         (9, "same name", "B", 20)],
        "p_id long, name string, brand string, size int",
    )
    probe = spark.createDataFrame(
        [(100, "same name", "B", 10)],
        "f_id long, name string, brand string, size int",
    )
    sim = 1.0 - F.levenshtein("name", "m_name") / F.greatest(
        F.length("name"), F.length("m_name")
    ).cast("double")
    row = blocked_link(
        probe, master, on=["brand"], probe_id="f_id", master_id="p_id",
        score=sim, min_score=0.5, band_col="size", band=1,
    ).collect()[0]
    # size 20 is outside the +/-1 band; ids 4 and 5 tie on score ->
    # lowest master id wins
    assert row["matched_id"] == 4


def test_blocked_link_prefilter_prunes_before_score(spark):
    master = spark.createDataFrame(
        [(1, "abcdefgh", "B", 1)], "p_id long, name string, brand string, size int"
    )
    probe = spark.createDataFrame(
        [(9, "ab", "B", 1)], "f_id long, name string, brand string, size int"
    )
    sim = 1.0 - F.levenshtein("name", "m_name") / F.greatest(
        F.length("name"), F.length("m_name")
    ).cast("double")
    out = blocked_link(
        probe, master, on=["brand"], probe_id="f_id", master_id="p_id",
        score=sim, min_score=0.0,
        prefilter=F.abs(F.length("name") - F.length("m_name")) <= 2,
    ).collect()[0]
    # length gap 6 > 2 -> pruned before scoring -> unmatched
    assert out["matched_id"] is None
