"""Profile q40_simhash_near_dups component-by-component (guide §1) and
A/B the r12 per-row Python shingle kernel vs the r13 Arrow-native one,
interleaved in one JVM so both arms share the host band."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark import StorageLevel

from streaming_feature_store_spark.operators.dedup import (
    _minhash_band_pairs,
    _shingle_index,
    _verify_candidates,
    simhash64,
    simhash_pairs,
)
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def force(df):
    df.write.mode("overwrite").format("noop").save()


def _shingle_index_r12(df, text_col, id_col, n):
    """The r12 per-row loop kernel, verbatim (A/B reference arm)."""
    import pandas as pd

    from streaming_feature_store_spark.operators.text import cpu_partitioned

    id_type = df.schema[id_col].dataType.simpleString()

    def gen(batches):
        for pdf in batches:
            ids, grams = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks = t.split(" ") if isinstance(t, str) else []
                if len(toks) >= n:
                    s = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
                    ids.extend([i] * len(s))
                    grams.extend(s)
            yield pd.DataFrame({id_col: ids, "gram": grams})

    return (
        cpu_partitioned(df.select(id_col, text_col))
        .mapInPandas(gen, f"{id_col} {id_type}, gram string")
        .select(F.col(id_col), F.xxhash64("gram").alias("sh"))
    )


def timed(label, fn, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(ts)} median={sorted(ts)[len(ts)//2]} {ts}")
    return min(ts)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("simhash-profile")
    spark.sparkContext.setLogLevel("ERROR")
    force(spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) s"))
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    print("docs:", docs.count())

    # kernel A/B, interleaved
    for _ in range(3):
        timed("  kernel r12 (python loop)", lambda: force(_shingle_index_r12(docs, "text", "doc_id", 3)), reps=1)
        timed("  kernel r13 (arrow)      ", lambda: force(_shingle_index(docs, "text", "doc_id", 3)), reps=1)

    # components
    timed("simhash64 (63 bit-sums)", lambda: force(simhash64(docs, "text", "doc_id")))
    timed("simhash_pairs (band join)", lambda: force(simhash_pairs(docs, "text", "doc_id", 8, 7)))

    idx = _shingle_index(docs, "text", "doc_id", 3).persist(StorageLevel.MEMORY_AND_DISK)
    idx.count()
    timed("minhash_band_pairs (idx persisted)", lambda: force(_minhash_band_pairs(idx, "doc_id")))
    cands = simhash_pairs(docs, "text", "doc_id", 8, 7).select("doc_a", "doc_b").union(
        _minhash_band_pairs(idx, "doc_id")
    ).distinct()
    timed("verify (full cand union)", lambda: force(_verify_candidates(cands, idx, "doc_id", 0.5)))
    spark.stop()


if __name__ == "__main__":
    main()
