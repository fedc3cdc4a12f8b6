"""End-to-end demo: the experimentation readout stack over event data.

    events (sf dir)
      → deterministic arm assignment (user-id parity — the hash-split
        every experimentation platform uses)
      → per-(event_type × daypart) grouped z-tests in one pass
      → Benjamini–Hochberg FDR control across all hypotheses
      → difference-in-differences per event type (pre/post × arm)
      → delta-method CI for the value-per-event ratio metric,
        clustered by user
      → uplift/Qini curve by exact value decile
      → ranking-quality eval (NDCG@3) of the pre-period value ranking
        against post-period interactions

Run: python examples/demo_experiment_readout.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.ml.ranking import ranking_metrics
from streaming_feature_store_spark.operators.experiment import (
    bh_fdr,
    diff_in_diff,
    grouped_ztest,
    ratio_metric_delta,
    uplift_deciles,
)
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-experiment")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    trt = (F.col("user_id") % 2) == 1
    cut = F.lit("2024-01-16 00:00:00").cast("timestamp")
    print(f"events: {ev.count()} rows from {sf_dir}")

    # 1. fleet of z-tests + FDR control
    cells = ev.withColumn("slot", F.floor(F.hour("ts") / 6).cast("long"))
    zt = grouped_ztest(cells, ["event_type", "slot"], trt, "value")
    screened = bh_fdr(zt, "p_value", ["event_type", "slot"], alpha=0.05)
    n_hyp = screened.count()
    n_rej = screened.filter("rejected").count()
    min_padj = screened.agg(F.min("p_adj")).first()[0]
    print(
        f"A/B screen: {n_hyp} hypotheses, {n_rej} rejected at FDR 0.05, "
        f"min adjusted p = {min_padj}"
    )

    # 2. quasi-experimental DiD per event type
    did = diff_in_diff(ev, ["event_type"], trt, F.col("ts") >= cut, "value")
    for r in did.orderBy("event_type").collect():
        print(
            f"DiD {r['event_type']}: did={r['did']} se={r['se']} "
            f"p={r['p_value']}"
        )

    # 3. clustered ratio metric
    ci = ratio_metric_delta(ev, "user_id", ["event_type"], "value",
                            F.lit(1.0))
    for r in ci.orderBy("event_type").collect():
        print(
            f"value/event {r['event_type']}: {r['ratio']} "
            f"[{r['ci_lo']}, {r['ci_hi']}] over {r['n_units']} users"
        )

    # 4. uplift by exact value decile
    up = uplift_deciles(
        ev, trt, "value", F.col("event_type") == "purchase", ["event_id"]
    )
    top = up.orderBy(F.desc("bucket")).first()
    print(
        f"uplift deciles: top bucket uplift={top['uplift']}, "
        f"final qini_cum={up.orderBy('bucket').first()['qini_cum']}"
    )

    # 5. ranking quality of the pre-period value ordering
    pre = F.col("ts") < cut
    pairs = ev.groupBy(
        (F.col("user_id") % 4).alias("cohort"), "user_id", "event_type"
    ).agg(
        (
            F.sum(F.when(pre, F.col("value")).cast("decimal(18,4)")).cast(
                "double"
            )
            / F.count(F.when(pre, F.col("value")))
        ).alias("score"),
        F.count(F.when(~pre, 1)).alias("rel"),
    )
    rk = ranking_metrics(
        pairs, ["cohort"], "user_id", "event_type", "score", "rel", k=3
    )
    for r in rk.orderBy("cohort").collect():
        print(
            f"cohort {r['cohort']}: NDCG@3={r['ndcg_at_k']} "
            f"P@3={r['precision_at_k']} R@3={r['recall_at_k']} "
            f"({r['n_users']} users)"
        )

    print("experiment readout complete.")
    spark.stop()


if __name__ == "__main__":
    main()
