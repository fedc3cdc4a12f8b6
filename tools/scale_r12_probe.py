"""Round-12 scale probe: (A) is the daily ingest's WRITE volume now
delta-priced — ~flat in corpus size — under the d=<n> delta-log layout
(VERDICT r11 finding #1 / next-item #1), where the r11 snapshot layout
rewrote the corpus-sized fingerprint/minhash/postings relations every
day?  (B) does the by_term postings layout beat by_doc for a query
batch too large to broadcast (VERDICT r11 finding #2 — the regime the
forced broadcast(qterms) hint made unreachable)?  (C) steady-state
docs/s through daily_ingest_sink (VERDICT r11 next-item #6).

A. For growing base corpora (fixed 2k-doc daily delta): seed the state,
   ingest one day, and measure (i) bytes the day actually wrote vs
   (ii) bytes a full-snapshot rewrite of the same state would have
   written (= the whole state's current size, what r11 paid).  Expected:
   (i) ~flat as the base grows, (ii) linear.

B. 200k-doc postings, 30k-query batch (far over the broadcast
   threshold): score it through bm25_from_index on the by_doc copy vs
   the by_term copy, default AQE confs.  Results asserted equal.

C. 8 batches x 2k docs through the composed sink; steady-state docs/s
   over the warm batches.

Usage: python tools/scale_r12_probe.py [base_A...] [n_docs_B] [n_q_B]
Rows land in PERFORMANCE.md (round-12 section).
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

from streaming_feature_store_spark.session import get_spark
from tools.scale_dedup_probe import synth_docs


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def canon(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def probe_write_volume(spark, tmp: str, bases: list[int]) -> None:
    from streaming_feature_store_spark.operators.curation import daily_ingest

    n_delta = 2_000
    print(f"== A. daily write volume vs corpus size (fixed {n_delta}-doc "
          "delta) ==")
    for n_base in bases:
        root = f"{tmp}/state_{n_base}_{uuid.uuid4().hex[:6]}"
        docs = synth_docs(spark, n_base + n_delta).persist()
        base = docs.filter(F.col("doc_id") < n_base)
        delta = docs.filter(F.col("doc_id") >= n_base)
        t0 = time.time()
        daily_ingest(base, root, bigrams=False, screen_near_dups=False)
        seed_s = time.time() - t0
        before = du(root)
        t0 = time.time()
        daily_ingest(delta, root, bigrams=False)
        day_s = time.time() - t0
        after = du(root)
        day_bytes = after - before
        # what the r11 snapshot layout paid per day: a full rewrite of
        # every index relation = the state's whole current size minus
        # the (still snapshot-shaped) stats + reports
        full_state = sum(
            du(f"{root}/{k}") for k in ("fingerprint", "minhash", "postings")
        )
        print(
            f"  base {n_base:>7}: day wrote {day_bytes / 1e6:7.1f} MB "
            f"in {day_s:5.1f}s; snapshot layout would rewrite "
            f"{full_state / 1e6:7.1f} MB of doc-keyed state "
            f"(x{full_state / max(day_bytes, 1):.1f}); seed {seed_s:.1f}s"
        )
        docs.unpersist()
        shutil.rmtree(root, ignore_errors=True)


def probe_by_term_regime(spark, tmp: str, n_docs: int, n_q: int) -> None:
    from streaming_feature_store_spark.operators.text import (
        bm25_from_index,
        corpus_stats_index,
        drop_postings_index,
        load_postings_index,
        postings_index,
        save_postings_index,
    )

    print(f"== B. by_term vs by_doc at {n_docs} docs, {n_q}-query batch ==")
    docs = synth_docs(spark, n_docs).persist()
    stats = corpus_stats_index(docs, bigrams=False).persist()
    stats.count()
    name = f"r12_probe_{uuid.uuid4().hex[:8]}"
    qdf = spark.range(n_q).select(
        F.concat(F.lit("q"), F.col("id")).alias("query_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("w"), (F.col("id") % 40)),
            F.concat(F.lit("w"), ((F.col("id") + 7) % 40)),
            F.concat(F.lit("w"), ((F.col("id") + 19) % 40)),
        ).alias("query_text"),
    ).persist()
    qdf.count()
    try:
        t0 = time.time()
        save_postings_index(postings_index(docs), name, f"{tmp}/{name}")
        print(f"  one-time layout write (by_doc + by_term + dl): "
              f"{time.time() - t0:.1f}s")
        out = {}
        for layout in ("by_doc", "by_term"):
            tf, dl = load_postings_index(spark, name, layout=layout)
            reps = []
            for _ in range(3):
                t0 = time.time()
                scored = bm25_from_index(
                    tf, stats, qdf, k=3, doc_lengths=dl
                )
                scored.write.mode("overwrite").format("noop").save()
                reps.append(time.time() - t0)
            out[layout] = scored
            print(f"  {layout:8}: median batch {sorted(reps)[1]:.1f}s "
                  f"(reps {[round(r, 1) for r in reps]})")
        # k x n_q rows: asserting exact equality is cheap relative to
        # the scoring itself
        assert canon(out["by_doc"]) == canon(out["by_term"])
        print("  parity: by_doc ≡ by_term results (exact)")
    finally:
        drop_postings_index(spark, name)
        docs.unpersist()
        stats.unpersist()
        qdf.unpersist()


def probe_sink_rate(spark, tmp: str) -> None:
    from streaming_feature_store_spark.operators.curation import (
        daily_ingest_sink,
    )

    n_batch, n_batches = 2_000, 8
    print(f"== C. daily_ingest_sink steady state ({n_batches} x {n_batch} "
          "docs) ==")
    docs = synth_docs(spark, n_batch * n_batches).persist()
    docs.count()
    state = f"{tmp}/sink_state_{uuid.uuid4().hex[:6]}"
    handle = daily_ingest_sink(state, bigrams=False)
    warm = []
    for i in range(n_batches):
        b = docs.filter(
            (F.col("doc_id") >= i * n_batch)
            & (F.col("doc_id") < (i + 1) * n_batch)
        )
        t0 = time.time()
        handle(b, i)
        el = time.time() - t0
        if i >= 3:
            warm.append(el)
    rate = n_batch * len(warm) / sum(warm)
    print(f"  steady-state (batches 4-{n_batches}): "
          f"{rate:,.0f} docs/s through the full screen->merge->score day "
          f"({sum(warm) / len(warm):.1f}s per {n_batch}-doc batch)")
    docs.unpersist()
    shutil.rmtree(state, ignore_errors=True)


def main() -> None:
    bases = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [20_000, 60_000, 180_000]
    )
    n_docs_b = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    n_q_b = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000
    spark = get_spark("scale-r12-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r12_probe_")
    try:
        probe_write_volume(spark, tmp, bases)
        probe_by_term_regime(spark, tmp, n_docs_b, n_q_b)
        probe_sink_rate(spark, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
