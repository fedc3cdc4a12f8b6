"""Phase-level profile of daily_ingest's SEED day (screen_near_dups=False).

Replicates the seed-day sequence with timers around each action.
Usage: python tools/ingest_profile5.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from streaming_feature_store_spark.cacheutil import (
        persist_tracked,
        release_cached_intermediates,
    )
    from streaming_feature_store_spark.operators.dedup import (
        build_minhash_index,
        fingerprint_log_screen,
        exact_dup_groups,
    )
    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index,
        postings_index,
    )
    from streaming_feature_store_spark.streaming.dedup import append_log_delta
    from streaming_feature_store_spark.session import get_spark
    from streaming_feature_store_spark.sources.file import load_table

    spark = get_spark("ingest-profile5")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4)))") \
        .write.mode("overwrite").format("noop").save()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    id_col, text_col = "doc_id", "text"

    for rep in range(reps):
        root = os.path.join(
            tempfile.gettempdir(), f"sfs_prof5_{uuid.uuid4().hex}"
        )
        try:
            marks = []
            t = [time.time()]

            def mark(label):
                marks.append((label, time.time() - t[0]))
                t[0] = time.time()

            delta = base
            fp_log = exact_dup_groups(delta.limit(0), text_col, id_col)
            fp_screen = persist_tracked(
                fingerprint_log_screen(delta, fp_log, text_col, id_col)
            )
            exact_surv = persist_tracked(
                delta.join(
                    fp_screen.filter(~F.col("is_corpus_dup")).select(id_col),
                    id_col, "left_semi",
                )
            )
            mh_delta = persist_tracked(
                build_minhash_index(exact_surv, text_col, id_col)
            )
            id_type = delta.schema[id_col].dataType.simpleString()
            mh_screen = exact_surv.select(
                F.col(id_col),
                F.lit(False).alias("is_near_dup"),
                F.lit(None).cast(id_type).alias("best_match_id"),
                F.lit(None).cast("double").alias("best_jaccard"),
                F.lit(None).cast("boolean").alias("match_in_index"),
            )
            keep_ids = exact_surv.select(id_col)
            screen_plan = (
                fp_screen.select(
                    id_col, "fingerprint",
                    F.col("is_corpus_dup").alias("is_exact_dup"),
                )
                .join(mh_screen, id_col, "left")
                .join(keep_ids.withColumn("_kept", F.lit(True)), id_col,
                      "left")
                .select(
                    id_col, "fingerprint", "is_exact_dup",
                    F.coalesce("is_near_dup", F.lit(False)).alias(
                        "is_near_dup"),
                    "best_match_id", "best_jaccard", "match_in_index",
                    F.coalesce("_kept", F.lit(False)).alias("kept"),
                )
            )
            mark("construct")
            screen_plan.write.mode("overwrite").parquet(f"{root}/reports/v=1")
            mark("WRITE_report(md5+joins)")
            screen = spark.read.parquet(f"{root}/reports/v=1")
            survivors = delta.join(
                screen.filter(F.col("kept")).select(id_col), id_col,
                "left_semi"
            )
            stats_updated = corpus_stats_index(
                survivors, id_col, text_col, False
            )
            p_delta = postings_index(survivors, id_col, text_col)
            ledger = fp_screen.groupBy("fingerprint").agg(
                F.count("*").alias("dup_count"),
                F.min(id_col).alias("first_doc_id"),
            )
            mark("construct2")
            stats_updated.write.mode("overwrite").parquet(f"{root}/stats/v=1")
            mark("WRITE_stats(tokenize)")
            append_log_delta(mh_delta, f"{root}/minhash", 1)
            mark("WRITE_mh(shingle+minhash)")
            append_log_delta(ledger, f"{root}/fingerprint", 1)
            mark("WRITE_ledger")
            append_log_delta(p_delta, f"{root}/postings", 1)
            mark("WRITE_postings")
            print(f"rep{rep}: " + " ".join(
                f"{k}={v:.2f}s" for k, v in marks), flush=True)
            release_cached_intermediates()
        finally:
            shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
