"""Round-11 scale probe: (A) does the EXECUTABLE bucketed postings layout
delete the BM25 query-time shuffle it promises, and what does it cost to
build?  (B) at what boilerplate-set size does the (now unhinted)
line-dedup anti-join stop broadcasting, and does AQE handle both regimes?

A. BM25 layout (VERDICT r10 next-item #1): 100k synth docs; the tall
   parquet postings frame vs the save_postings_index bucketed tables.
   Both paths answer the same query batch; results asserted EXACTLY
   equal; the probe prints per-batch latency and the count of shuffle
   Exchanges in each FINAL adaptive plan (the bucketed path's postings
   side must contribute zero).

B. Boilerplate anti-join (VERDICT r10 finding #1 + next-item #7): the
   r10 verdict flagged the forced broadcast of the >=min_docs line set;
   round 11 dropped the hint per the text.py:704 AQE-gate policy.  This
   probe builds a 1M-doc line-frequency index in two regimes — a small
   line pool (boilerplate set far under the 10MB broadcast threshold)
   and a large pool (set far over it) — cleans a 10k-doc delta against
   each, and prints the join strategy AQE actually picked plus latency.
   Expected: broadcast in the small regime (the forced hint was never
   needed), shuffled anti-join in the large one (where the forced hint
   would have shipped the set to every executor / OOMed at web scale).

Usage: python tools/scale_r11_probe.py [n_docs_A] [n_docs_B]
Rows land in PERFORMANCE.md (round-11 section).
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F

from streaming_feature_store_spark.session import get_spark
from tools.scale_dedup_probe import synth_docs


def timed(label: str, fn):
    t0 = time.time()
    out = fn()
    el = time.time() - t0
    print(f"{label}: {el:.1f}s")
    return out, el


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


_SHUFFLE_MARKS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
)


def final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def shuffles(plan: str) -> int:
    return sum(plan.count(m) for m in _SHUFFLE_MARKS)


def probe_bm25_layout(spark, tmp: str, n_docs: int) -> None:
    from streaming_feature_store_spark.operators.text import (
        bm25_from_index,
        corpus_stats_index,
        drop_postings_index,
        load_postings_index,
        postings_index,
        save_postings_index,
    )

    print(f"== A. BM25 bucketed layout at {n_docs} docs ==")
    docs = synth_docs(spark, n_docs)
    postings_index(docs).write.mode("overwrite").parquet(f"{tmp}/tall")
    corpus_stats_index(docs, bigrams=False).write.mode("overwrite").parquet(
        f"{tmp}/stats"
    )
    tall = spark.read.parquet(f"{tmp}/tall")
    stats = spark.read.parquet(f"{tmp}/stats")
    name = f"r11probe_{uuid.uuid4().hex[:8]}"
    _, t_layout = timed(
        "  one-time bucketed layout write (by_doc + dl)",
        lambda: save_postings_index(
            tall, name, f"{tmp}/bucketed", layouts=("by_doc",)
        ),
    )
    tf, dl = load_postings_index(spark, name)
    qdf = spark.createDataFrame(
        [(f"q{i}", f"w{i} w{i + 7} w{i + 19}") for i in range(20)],
        "query_id string, query_text string",
    )

    def run_tall():
        return bm25_from_index(tall, stats, qdf, k=10)

    def run_bucketed():
        return bm25_from_index(tf, stats, qdf, k=10, doc_lengths=dl)

    got_t, got_b = run_tall(), run_bucketed()
    assert canon(got_t) == canon(got_b), "layout changed BM25 results"
    print("  parity: bucketed ≡ tall-frame results (exact)")

    def bench(label, run):
        ts = []
        plan = ""
        for _ in range(3):
            t0 = time.time()
            df = run()
            df.count()
            ts.append(time.time() - t0)
            plan = final_plan(df)
        ts.sort()
        print(
            f"  {label}: median query-batch {ts[1]:.1f}s "
            f"(min {ts[0]:.1f}), shuffle exchanges in final plan: "
            f"{shuffles(plan)}"
        )

    # default config: at probe scale AQE broadcasts the dl side, masking
    # the |docs| shuffle the layout exists to delete
    bench("tall-frame (default conf)", run_tall)
    bench("bucketed   (default conf)", run_bucketed)
    # at-scale regime: dl exceeds the broadcast threshold (100 TB: per-doc
    # length rows are GBs).  autoBroadcastJoinThreshold=-1 kills ONLY the
    # opportunistic dl broadcast — bm25's qterms/stats sides carry
    # explicit broadcast() hints that survive the conf — so this is the
    # honest simulation of the regime bucketing targets.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bench("tall-frame (dl not broadcastable)", run_tall)
        bench("bucketed   (dl not broadcastable)", run_bucketed)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    drop_postings_index(spark, name)


def synth_lined_docs(
    spark, n: int, pool: int, lines_per_doc: int = 10, start: int = 0
):
    """Docs of ``lines_per_doc`` lines drawn deterministically from a pool
    of ``pool`` distinct lines — expected ~n*lines_per_doc/pool docs per
    line, so pool << n*lines gives a boilerplate-heavy corpus.  ``start``
    offsets the ids INTO the hash so two calls generate distinct docs."""
    return spark.range(n).select(
        (F.col("id") + start).alias("doc_id"),
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(1), F.lit(lines_per_doc)),
                lambda j: F.concat(
                    F.lit("common line text number "),
                    (
                        F.abs(F.xxhash64(F.col("id") + start, j)) % pool
                    ).cast("string"),
                ),
            ),
        ).alias("text"),
    )


def probe_line_dedup_antijoin(spark, tmp: str, n_docs: int) -> None:
    from streaming_feature_store_spark.operators.text import (
        line_dedup_from_index,
        line_freq_index,
        line_freq_index_merge,
    )

    print(f"== B. line-dedup anti-join regimes at {n_docs} base docs ==")
    n_delta = 10_000
    # small pool: boilerplate set far under the 10MB broadcast threshold;
    # large pool sized so ~most lines land in >=2 docs and the set's
    # estimated size clears the threshold (the regime where the old
    # FORCED hint would ship it to every executor)
    for label, pool in (("small-pool", 50_000), ("large-pool", n_docs * 2)):
        base = synth_lined_docs(spark, n_docs, pool)
        delta = synth_lined_docs(spark, n_delta, pool, start=n_docs)
        iroot = f"{tmp}/lineidx_{label}"
        line_freq_index(base).write.mode("overwrite").parquet(iroot)
        idx = line_freq_index_merge(
            spark.read.parquet(iroot), line_freq_index(delta)
        )
        n_boiler = idx.filter(F.col("n_docs") >= 2).count()

        def run():
            out = line_dedup_from_index(delta, idx, min_docs=2)
            row = out.agg(
                F.count("*").alias("n"), F.avg("kept_frac").alias("kf")
            ).collect()[0]
            return out, row

        (out, row), el = timed(f"  {label} clean 10k-doc delta", run)
        plan = final_plan(line_dedup_from_index(delta, idx, min_docs=2))
        # classify by which physical join carries the LeftAnti
        anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        kinds = {
            ln.strip().lstrip("+-: ").split(" ")[0] for ln in anti_lines
        }
        print(
            f"    boilerplate set: {n_boiler} lines; delta docs "
            f"{row['n']}, kept_frac avg {row['kf']:.3f}; "
            f"anti-join strategy AQE picked: {sorted(kinds)}"
        )
        from streaming_feature_store_spark.cacheutil import (
            release_cached_intermediates,
        )

        release_cached_intermediates()


def probe_daily_ingest(spark, tmp: str, n_docs: int) -> None:
    """C. the composed daily path priced on the delta: seed a base corpus
    once (screen_near_dups=False — signatures only), then ingest a 1%
    delta day through curation.daily_ingest, vs the NAIVE day that
    re-runs every pipeline stage over base ∪ delta from scratch (exact
    groups + near-dup pairs + stats + postings + quality)."""
    import pyspark.sql.functions as F

    from streaming_feature_store_spark.cacheutil import (
        release_cached_intermediates,
    )
    from streaming_feature_store_spark.operators.curation import daily_ingest
    from streaming_feature_store_spark.operators.dedup import (
        exact_dup_groups,
        minhash_near_dups,
    )
    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index,
        postings_index,
        unigram_nll,
    )

    print(f"== C. daily_ingest at {n_docs} base docs + 1% delta ==")
    docs = synth_docs(spark, n_docs)
    cut = int(n_docs * 0.99)
    base = docs.filter(F.col("doc_id") < cut)
    delta = docs.filter(F.col("doc_id") >= cut)
    state = f"{tmp}/ingest_state"
    _, t_seed = timed(
        "  one-time base seeding (signatures + indexes)",
        lambda: daily_ingest(base, state, bigrams=False,
                             screen_near_dups=False),
    )
    release_cached_intermediates()

    def day():
        survivors, reports = daily_ingest(delta, state, bigrams=False)
        return reports["quality"].count()

    _, t_inc = timed("  incremental day (screen+merge+score, ONE call)", day)
    release_cached_intermediates()

    def naive():
        alld = base.unionByName(delta)
        n = exact_dup_groups(alld).count()
        n += minhash_near_dups(alld).count()
        corpus_stats_index(alld, bigrams=False).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/naive_stats")
        postings_index(alld).write.mode("overwrite").parquet(
            f"{tmp}/naive_postings"
        )
        return n + unigram_nll(delta).count()

    _, t_full = timed("  naive day (recompute every stage over corpus)", naive)
    release_cached_intermediates()
    print(
        f"  daily cost priced on the delta: {t_full:.1f}s -> {t_inc:.1f}s "
        f"({t_full / max(t_inc, 1e-9):.1f}x); seeding amortized once "
        f"({t_seed:.1f}s)"
    )


def main():
    n_a = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_b = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_c = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    spark = get_spark("scale-r11")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r11probe_")
    try:
        probe_bm25_layout(spark, tmp, n_a)
        probe_line_dedup_antijoin(spark, tmp, n_b)
        probe_daily_ingest(spark, tmp, n_c)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
