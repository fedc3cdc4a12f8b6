"""Composed continuous-monitoring pipeline — the OBSERVABILITY side of
the daily ingest, built from the round-9 second-batch operators: all
monitoring state is tiny persisted summaries maintained incrementally;
no check ever rescans history.

Day 0 (one-time):
  1. sessionize history, persist the session table    (sessions.sessionize)
  2. build + persist the drift-baseline histograms    (drift.histogram_index)
  3. build + persist the distinct-cardinality index   (profile.distinct_index_merge)

Day 1..N (the recurring path):
  4. merge the day into the session table             (sessions.session_index_merge)
  5. PSI of the day vs the persisted baseline         (drift.psi_from_histograms)
  6. percentile monitoring from the merged histogram  (drift.histogram_quantiles)
  7. new-entity screen: cells first seen today        (profile.distinct_index_merge)
  8. fold the baseline forward                        (drift.histogram_index_merge)

Run:  python examples/demo_continuous_monitoring.py [sf_dir]
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from streaming_feature_store_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("continuous-monitoring-demo")
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_feature_store_spark.operators.drift import (
        histogram_index,
        histogram_index_merge,
        histogram_quantiles,
        psi_from_histograms,
    )
    from streaming_feature_store_spark.operators.profile import (
        distinct_index_merge,
    )
    from streaming_feature_store_spark.operators.sessions import (
        session_index_merge,
        sessionize,
    )

    from streaming_feature_store_spark.sources.file import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", "ts", "value"
    )
    cut = "2024-01-22 00:00:00"
    cutc = F.lit(cut).cast("timestamp")
    hist, today = ev.filter(F.col("ts") < cutc), ev.filter(F.col("ts") >= cutc)
    specs = {"value": [10.0, 25.0, 50.0, 100.0, 200.0]}

    print("== day 0: build monitoring state over history ==")
    sess_idx = sessionize(hist, "user_id")
    base_hist = histogram_index(hist, specs)
    base_cells = (
        hist.select("event_type", "user_id", F.hour("ts").alias("h"))
        .distinct()
    )
    print(f"sessions indexed: {sess_idx.count()}; "
          f"baseline buckets: {base_hist.count()}; "
          f"distinct cells: {base_cells.count()}")

    print("\n== day N: price the delta only ==")
    merged_sessions = session_index_merge(today, sess_idx, cut, "user_id")
    print(f"sessions after merge: {merged_sessions.count()} "
          f"(history never re-sessionized)")

    today_hist = histogram_index(today, specs)
    drift = psi_from_histograms(base_hist, today_hist)
    for r in drift.collect():
        flag = "OK" if r["psi"] is not None and r["psi"] < 0.1 else "DRIFT?"
        print(f"psi[{r['feature']}] vs baseline = {r['psi']}  [{flag}]")

    folded = histogram_index_merge(base_hist, today_hist)
    for r in histogram_quantiles(folded, specs, [0.5, 0.95]).orderBy(
        "feature", "q"
    ).collect():
        print(f"p{int(r['q'] * 100)}[{r['feature']}] = {r['estimate']}")

    report, _ = distinct_index_merge(
        today.select("event_type", "user_id", F.hour("ts").alias("h")),
        base_cells,
        ["event_type"],
        ["user_id", "h"],
    )
    for r in report.orderBy("event_type").collect():
        print(f"{r['event_type']}: {r['n_distinct']} user-hour cells, "
              f"{r['n_new']} first seen today")


if __name__ == "__main__":
    main()
