"""A/B: save_postings_index's table writes sequential vs overlapped from
a driver pool (guide §2.6).  Interleaved reps in ONE JVM so host stalls
land on both arms; prints per-rep seconds and min per arm.

Usage: python tools/postings_write_ab.py [reps] [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import uuid
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from streaming_feature_store_spark.cacheutil import (
        persist_tracked,
        release_cached_intermediates,
    )
    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index,
        drop_postings_index,
        postings_index,
    )
    from streaming_feature_store_spark.session import get_spark
    from streaming_feature_store_spark.sources.file import load_table

    spark = get_spark("postings-write-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) s").collect()

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(mode: str) -> float:
        name = f"sfs_ab_{uuid.uuid4().hex[:10]}"
        path = os.path.join(tempfile.gettempdir(), f"{name}_data")
        t0 = time.time()
        stats = persist_tracked(corpus_stats_index(docs, bigrams=False))
        stats.count()  # materialize the shared tf cache (both arms pay it)
        index = postings_index(docs)
        tf = index.filter(F.col("term").isNotNull())
        dl = index.filter(F.col("term").isNull()).select(
            "doc_id", F.col("n").alias("dl")
        )

        def w_tf():
            (tf.write.mode("overwrite").bucketBy(32, "doc_id").sortBy("doc_id")
             .option("path", f"{path}/tf_by_doc").saveAsTable(f"{name}_tf_by_doc"))

        def w_dl():
            (dl.write.mode("overwrite").bucketBy(32, "doc_id").sortBy("doc_id")
             .option("path", f"{path}/dl").saveAsTable(f"{name}_dl"))

        if mode == "seq":
            w_tf(); w_dl()
        else:
            with ThreadPoolExecutor(max_workers=2) as pool:
                for f in [pool.submit(w) for w in (w_tf, w_dl)]:
                    f.result()
        el = time.time() - t0
        release_cached_intermediates()
        drop_postings_index(spark, name)
        shutil.rmtree(path, ignore_errors=True)
        return round(el, 3)

    out = {"seq": [], "pool": []}
    run("seq")  # one warmup discarded
    for _ in range(reps):
        for mode in ("seq", "pool"):
            out[mode].append(run(mode))
    for mode, ts in out.items():
        print(mode, "min", min(ts), "median", sorted(ts)[len(ts) // 2], ts)
    spark.stop()


if __name__ == "__main__":
    main()
