"""Phase-level wall-clock profile of the q244 daily-ingest lifecycle.

Mirrors daily_ingest's internal step sequence (same operators, same
order) with a timer around every materializing action, so the composed
call's 20+ s bench cost can be attributed to phases instead of guessed.
Usage: python tools/ingest_profile.py [sf_dir]
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

    from streaming_feature_store_spark.operators.curation import daily_ingest
    from streaming_feature_store_spark.cacheutil import (
        release_cached_intermediates,
    )
    from streaming_feature_store_spark.session import get_spark
    from streaming_feature_store_spark.sources.file import load_table

    spark = get_spark("ingest-profile")
    spark.sparkContext.setLogLevel("ERROR")

    # warmups as in bench.py
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4)))") \
        .write.mode("overwrite").format("noop").save()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    delta = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        docs.filter(
            (F.col("doc_id") % 3 != 0) & (F.col("doc_id") % 7 == 1)
        ).select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )

    for rep in range(3):
        root = os.path.join(
            tempfile.gettempdir(), f"sfs_prof_{uuid.uuid4().hex}"
        )
        try:
            t0 = time.time()
            daily_ingest(base, root, bigrams=False, screen_near_dups=False)
            t1 = time.time()
            release_cached_intermediates()
            _, reports = daily_ingest(delta, root, bigrams=False)
            t2 = time.time()
            out = reports["screen"].select(
                "doc_id", "is_exact_dup", "is_near_dup", "best_match_id",
                "best_jaccard", "match_in_index", "kept",
            )
            rows = out.collect()
            t3 = time.time()
            release_cached_intermediates()
            print(
                f"rep{rep}: seed_day={t1-t0:.2f}s delta_day={t2-t1:.2f}s "
                f"report_collect={t3-t2:.2f}s rows={len(rows)} "
                f"total={t3-t0:.2f}s",
                flush=True,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
