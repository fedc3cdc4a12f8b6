"""Composed pre-release data-quality gate — the audit pass a training
pipeline runs on a fresh warehouse snapshot BEFORE any model sees it,
built entirely from round-8 operators:

1. referential integrity  (profile.referential_audit)    — broken joins?
2. target-leakage screen  (profile.label_leakage_screen) — outcome-derived
   features?
3. t-closeness audit      (profile.t_closeness_report)   — does any QI
   group's sensitive mix leak?
4. boilerplate screen     (text.boilerplate_ngrams)      — corpus chrome
   that would dominate training loss
5. forecast sanity        (behavior.forecast_baseline_eval) — is the
   volume series predictable enough for anomaly alerting to mean anything

Run:  python examples/demo_quality_gate.py [sf_dir]
"""

from __future__ import annotations

import sys

import pyspark.sql.functions as F

sys.path.insert(0, ".")

from streaming_feature_store_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quality-gate-demo")
    spark.sparkContext.setLogLevel("ERROR")

    from streaming_feature_store_spark.operators.behavior import (
        forecast_baseline_eval,
    )
    from streaming_feature_store_spark.operators.profile import (
        label_leakage_screen,
        referential_audit,
        t_closeness_report,
    )
    from streaming_feature_store_spark.operators.text import (
        boilerplate_ngrams,
    )
    from streaming_feature_store_spark.sources.file import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")

    failures: list[str] = []

    print("== 1. referential integrity ==")
    audit = referential_audit(
        [
            ("orders->customer", orders, "o_custkey", cust, "c_custkey"),
            ("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
            ("lineitem->part", li, "l_partkey", part, "p_partkey"),
            ("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        ]
    ).collect()
    for r in audit:
        status = "OK" if r["n_orphan"] == 0 and r["n_null_fk"] == 0 else "FAIL"
        print(f"  {r['relation']:<22} rows={r['n_child']:>8} "
              f"null_fk={r['n_null_fk']} orphans={r['n_orphan']}  {status}")
        if status == "FAIL":
            failures.append(f"referential:{r['relation']}")

    print("== 2. target-leakage screen (label: l_returnflag = 'R') ==")
    for r in label_leakage_screen(
        li,
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        F.col("l_returnflag") == "R",
    ).collect():
        mark = "LEAK?" if r["flagged"] else "ok"
        print(f"  {r['feature']:<18} r={r['r_pb']}  {mark}")
        if r["flagged"]:
            failures.append(f"leakage:{r['feature']}")

    print("== 3. t-closeness (QI: nation, sensitive: market segment) ==")
    tc = t_closeness_report(
        cust, ["c_nationkey"], "c_mktsegment", t_threshold=0.3
    )
    worst = tc.orderBy(F.col("tvd").desc()).limit(3).collect()
    n_leaky = tc.filter(~F.col("t_close")).count()
    for r in worst:
        print(f"  nation={r['c_nationkey']:<4} rows={r['group_rows']:>5} "
              f"tvd={r['tvd']}  {'LEAKY' if not r['t_close'] else 'ok'}")
    print(f"  groups over t=0.3: {n_leaky}")
    if n_leaky:
        failures.append(f"t_closeness:{n_leaky} groups")

    print("== 4. boilerplate phrases (3-grams in >= 1% of docs) ==")
    n_docs = docs.count()
    bp = boilerplate_ngrams(docs, n=3, min_docs=max(2, n_docs // 100))
    top = bp.orderBy(F.col("n_docs").desc(), "gram").limit(5).collect()
    for r in top:
        print(f"  {r['n_docs']:>4} docs ({r['doc_frac']:.1%})  '{r['gram']}'")
    print(f"  candidate boilerplate phrases: {bp.count()}")

    print("== 5. event-volume forecast sanity (daily counts) ==")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("y"))
    for r in forecast_baseline_eval(
        daily, "event_type", "d", "y"
    ).collect():
        verdict = (
            "persistence beats weekly naive"
            if r["mase"] is not None and r["mase"] < 1
            else "weekly-seasonal (or flat)"
        )
        print(f"  {r['event_type']:<10} mase={r['mase']}  {verdict}")

    print()
    if failures:
        print(f"GATE: {len(failures)} finding(s): {failures}")
    else:
        print("GATE: clean snapshot")
    spark.stop()


if __name__ == "__main__":
    main()
