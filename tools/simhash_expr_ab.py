"""A/B the simhash64 bit-majority aggregate expression forms (guide §1.2
step 2 — per-task work): (a) r12 sum(when(bit, 1, -1)); (b) equivalent
2*sum((h>>i)&1) vs count; (c) bit-count over masked pairs. Interleaved in
one JVM; asserts identical simhash values."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from streaming_feature_store_spark.operators.dedup import simhash64
from streaming_feature_store_spark.session import get_spark
from streaming_feature_store_spark.sources.file import load_table


def force(df):
    df.write.mode("overwrite").format("noop").save()


def simhash64_b(df, text_col="text", id_col="doc_id"):
    """bit i of the signature = majority ⟺ 2*count_set_i > n_tokens."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    bit_sums = [
        F.sum(
            F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1).cast("long"))
        ).alias(f"b{i}")
        for i in range(63)
    ]
    agg = toks.groupBy(id_col).agg(F.count("*").alias("_n"), *bit_sums)
    sim = None
    for i in range(63):
        term = F.when(
            F.col(f"b{i}") * 2 > F.col("_n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return agg.select(F.col(id_col), sim.alias("simhash"))


def timed(label, fn, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        ts.append(round(time.time() - t0, 3))
    print(f"{label}: min={min(ts)} median={sorted(ts)[len(ts)//2]} {ts}")


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("simhash-expr-ab")
    spark.sparkContext.setLogLevel("ERROR")
    force(spark.range(1_000_000).selectExpr("sum(cast(id as decimal(18,4))) s"))
    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    a = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash64_b(docs).collect()}
    assert a == b, "variant B diverges"
    print("identical signatures:", len(a), "docs")

    for _ in range(2):
        timed("A when(+1/-1)", lambda: force(simhash64(docs)), reps=3)
        timed("B 2*sum(bit)>n", lambda: force(simhash64_b(docs)), reps=3)
    spark.stop()


if __name__ == "__main__":
    main()
