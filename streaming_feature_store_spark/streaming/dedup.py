"""Streaming deduplication: at-least-once transport → exactly-once events.

Kafka delivery in the reference's simple engine is at-least-once
(auto-commit consumer — stream_processor.py:93, SURVEY §2.6 T6); redelivered
events silently double-count its features. Spark's
``dropDuplicatesWithinWatermark`` dedups on the id columns alone while
expiring per-id state at the watermark horizon — the exact semantics
wanted here. (Plain ``dropDuplicates(id_cols)`` would only evict state if
the event-time column were part of the key subset; with id-only keys its
state grows without bound on a long-running stream.)

Scale: dedup state is keyed by (id), shuffle-partitioned like any keyed op;
the watermark bound means state size ≈ ids-per-horizon, independent of
stream lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events(
    stream: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    horizon: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered events by id; per-id state expires at the watermark
    horizon (bounded state ≈ ids-per-horizon). Batch frames fall back to
    plain dropDuplicates (no state to bound)."""
    if not stream.isStreaming:
        return stream.dropDuplicates(id_cols)
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(
        id_cols
    )


def _versioned_dirs(
    index_root: str, prefix: str = "v"
) -> dict[int, bool]:
    """List ``<prefix>=<n>`` directories under ``index_root`` →
    ``{version: committed}`` where committed means the directory carries
    parquet's ``_SUCCESS`` job marker.  Local-FS listing here; on a
    cluster this is one catalog/manifest lookup."""
    import os
    import re

    out: dict[int, bool] = {}
    if os.path.isdir(index_root):
        for d in os.listdir(index_root):
            m = re.fullmatch(rf"{prefix}=(\d+)", d)
            if m:
                out[int(m.group(1))] = os.path.exists(
                    os.path.join(index_root, d, "_SUCCESS")
                )
    return out


def _latest_snapshot(index_root: str, batch_id: int | None) -> int | None:
    """Newest COMMITTED snapshot version ≤ batch_id.  NOT the global max:
    a crashed attempt of THIS batch may already have written v=<id+1>,
    and its retry must re-merge against the pre-batch snapshot (the
    retry-idempotence contract the index sinks rely on).  ``batch_id
    = None`` means the newest version outright (the READER form — a
    query wants the latest committed snapshot).

    Committed means the directory carries parquet's ``_SUCCESS`` job
    marker (ADVICE r10): the sinks write snapshots directly to their
    final path, so a crash MID-write leaves a partial ``v=`` directory —
    without the marker gate a reader (or the NEXT batch's writer, whose
    ``<= batch_id`` filter only excludes its own retries) would treat
    the torn snapshot as newest and read a partial index.  ``_SUCCESS``
    appears only at job commit, so gating on it is exactly the
    visibility rule a table format's manifest provides.

    Committer-config dependency (ADVICE r11): snapshots written by a
    session with ``mapreduce.fileoutputcommitter.marksuccessfuljobs=
    false``, or staged by external tooling without the marker, are
    invisible to this gate.  When ``v=`` directories exist in scope but
    NONE is committed, that is indistinguishable from a wiped state
    root — a daily job would silently reseed as day 0 — so this warns
    loudly instead of returning None in silence (it still returns None:
    a day-0 crashed attempt legitimately leaves exactly one torn dir
    and its retry must proceed as day 0)."""
    import warnings

    dirs = _versioned_dirs(index_root)
    in_scope = {
        v: ok
        for v, ok in dirs.items()
        if batch_id is None or v <= batch_id
    }
    versions = [v for v, ok in in_scope.items() if ok]
    if in_scope and not versions:
        warnings.warn(
            f"{index_root}: {len(in_scope)} v= snapshot dir(s) exist but "
            "none carries a _SUCCESS marker — treating as empty (day 0). "
            "If these snapshots were written without the marker "
            "(marksuccessfuljobs=false or external tooling), readers and "
            "writers cannot see them; re-commit with the marker.",
            stacklevel=2,
        )
    return max(versions) if versions else None


def minhash_index_sink(
    index_root: str,
    pairs_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
):
    """``foreachBatch`` handler for streaming incremental dedup: each
    micro-batch of documents is merged against the persisted MinHash
    index (``operators.dedup.minhash_index_merge``) — new near-dup pairs
    land under ``pairs_root/batch=<id>``, the upserted index becomes a
    NEW snapshot ``index_root/v=<id+1>``.

    Exactly-once under foreachBatch retries without transactions, by
    versioning on the deterministic batch_id:

    - the merge reads the newest snapshot with version ≤ batch_id — a
      retried batch re-reads the PRE-batch snapshot even if the crashed
      attempt already wrote ``v=<id+1>``;
    - both writes are ``mode=overwrite`` into batch-derived paths, so a
      retry overwrites its own partial output instead of duplicating.

    Snapshot-versioned indexes also give readers isolation for free (a
    concurrent retrieval job keeps reading v=N while v=N+1 lands) at the
    cost of retaining old versions — compact with a retention sweep, as
    any table format does.  The streaming ≡ batch parity contract:
    after the stream drains, ``union(all pairs batches) ∪
    pairs-within-first-batch ≡ minhash_near_dups(all docs)``
    (tests/test_streaming.py).
    """
    from streaming_feature_store_spark.operators.dedup import (
        build_minhash_index,
        minhash_index_merge,
        minhash_index_pairs,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = _latest_snapshot(index_root, batch_id)
        if v is not None:
            index = spark.read.parquet(f"{index_root}/v={v}")
            pairs, updated = minhash_index_merge(
                batch_df, index, text_col, id_col, n, k, bands, threshold
            )
        else:
            updated = build_minhash_index(
                batch_df, text_col, id_col, n, k, bands
            )
            pairs = minhash_index_pairs(updated, id_col, threshold)
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )
        pairs.write.mode("overwrite").parquet(
            f"{pairs_root}/batch={batch_id}"
        )

    return _handle


def fingerprint_index_sink(
    index_root: str,
    screen_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` twin of the exact-dup ingest screen
    (``operators.dedup.fingerprint_index_merge``): each micro-batch is
    screened against the persisted fingerprint index snapshot — per-doc
    dup flags land under ``screen_root/batch=<id>``, the upserted index
    becomes ``index_root/v=<id+1>``.  Same retry-idempotence discipline
    as :func:`minhash_index_sink` (shared ``_latest_snapshot``): a
    retried batch re-reads the pre-batch snapshot and overwrites its own
    batch-derived outputs.  Docs arriving in the FIRST batch screen
    against an empty index (all novel) and seed snapshot v=1."""
    from streaming_feature_store_spark.operators.dedup import (
        exact_dup_groups,
        fingerprint_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        v = _latest_snapshot(index_root, batch_id)
        if v is not None:
            index = spark.read.parquet(f"{index_root}/v={v}")
            screen, updated = fingerprint_index_merge(
                batch_df, index, text_col, id_col
            )
        else:
            updated = exact_dup_groups(batch_df, text_col, id_col)
            import pyspark.sql.functions as F

            from streaming_feature_store_spark.operators.text import (
                fingerprint,
            )

            screen = fingerprint(batch_df, text_col).select(
                id_col,
                "fingerprint",
                F.lit(None).cast("long").alias("match_id"),
                F.lit(False).alias("is_corpus_dup"),
            )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )
        screen.write.mode("overwrite").parquet(
            f"{screen_root}/batch={batch_id}"
        )

    return _handle


def ivf_index_sink(
    index_root: str,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """``foreachBatch`` twin of ``similarity.ivf_index_merge``, closing
    its documented non-idempotent-append hole (the raw merge APPENDS to
    the cell table, so a retried batch would double its vectors): cell
    tables are batch-id-versioned snapshots ``index_root/cells/v=<id+1>``
    under the shared ``_latest_snapshot`` discipline — a retried batch
    re-reads the PRE-batch snapshot (never a crashed attempt's v=<id+1>)
    and overwrites its own batch-derived output, so the path is
    effectively-once without transactions.

    The FIRST non-empty batch trains the centroids
    (``_default_ivf_centroids``, deterministic for a given batch — a
    retry re-trains identically) and seeds snapshot v=1; later batches
    assign their vectors to the FIXED centroids (FAISS ``add``
    semantics) and write ``previous snapshot ∪ assigned delta`` as the
    next snapshot.  Query the latest committed snapshot with
    ``similarity.ivf_topk_snapshot``; bound retention with
    :func:`prune_snapshots` on ``index_root/cells``.

    Post-drain contract (tests/test_streaming.py): top-k answered from
    the newest snapshot ≡ a one-shot ``save_ivf_index`` build over all
    vectors WITH THE SAME CENTROIDS."""
    from streaming_feature_store_spark.operators.similarity import (
        _centroid_matrix,
        _default_ivf_centroids,
        _ivf_assign,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        cells_root = f"{index_root}/cells"
        v = _latest_snapshot(cells_root, batch_id)
        if v is None:
            centroids = _default_ivf_centroids(
                batch_df, nlist, id_col, vec_col
            )
            Cn = _centroid_matrix(centroids, vec_col)
            spark.createDataFrame(
                [(i, [float(x) for x in row]) for i, row in enumerate(Cn)],
                "cell long, vec array<double>",
            ).write.mode("overwrite").parquet(f"{index_root}/centroids")
            updated = _ivf_assign(batch_df, Cn, id_col, vec_col)
        else:
            import numpy as np

            cent = (
                spark.read.parquet(f"{index_root}/centroids")
                .orderBy("cell")
                .collect()
            )
            Cn = np.array([r["vec"] for r in cent], dtype=np.float64)
            prev = spark.read.parquet(f"{cells_root}/v={v}")
            updated = prev.unionByName(
                _ivf_assign(batch_df, Cn, id_col, vec_col)
            )
        updated.write.mode("overwrite").partitionBy("cell").parquet(
            f"{cells_root}/v={batch_id + 1}"
        )

    return _handle


def prune_snapshots(index_root: str, keep_last: int = 2) -> list[int]:
    """Retention sweep for batch-id-versioned index snapshots: delete all
    but the newest ``keep_last`` COMMITTED versions and return the pruned
    version numbers.  Run it OUTSIDE the stream (a maintenance job), and
    keep at least 2 so an in-flight retry of the current batch can still
    read its pre-batch snapshot — pruning to 1 while batch N retries
    would drop the version the retry needs.

    Only ``_SUCCESS``-committed versions count toward ``keep_last``
    (ADVICE r11): a torn (crashed mid-write) directory is not a snapshot
    any reader can use, so letting it occupy a keep slot could delete
    the last COMMITTED snapshot while two torn newer dirs survive —
    leaving readers with no visible state.  Torn dirs OLDER than the
    newest committed version are garbage from crashed attempts whose
    retries have since succeeded and are swept too; torn dirs NEWER than
    it are left alone (an in-flight writer may be mid-commit on them).

    Driver-side file ops (snapshots are directories this process owns);
    a cluster deployment maps this to the table format's
    expire-snapshots call."""
    import os
    import shutil

    dirs = _versioned_dirs(index_root)
    committed = sorted(v for v, ok in dirs.items() if ok)
    pruned = committed[:-keep_last] if keep_last > 0 else committed
    if committed:
        newest = committed[-1]
        pruned += [v for v, ok in dirs.items() if not ok and v < newest]
    for v in sorted(pruned):
        shutil.rmtree(os.path.join(index_root, f"v={v}"))
    return sorted(pruned)


# --- delta-log index layout (VERDICT r11 next-item #1) ----------------------
#
# The versioned-snapshot discipline above rewrites the WHOLE index every
# batch — fine for vocabulary-bounded state (corpus stats), O(corpus) write
# amplification for doc-keyed state (fingerprint ledger, MinHash signatures,
# BM25 postings: one row per doc / per (doc, term)).  Those relations are
# append-shaped under the daily-ingest contract (doc ids unique across
# days; recrawls are screened by fingerprint before they reach the other
# indexes), so their persisted form is a DELTA LOG:
#
#   root/
#     base/v=<k>/   optional compacted base covering days 1..k
#     d=<n>/        day n's delta rows only
#
# both committed via the same ``_SUCCESS`` gate as snapshots.  The logical
# index at version V = newest committed base k ≤ V, unioned with committed
# deltas k < d ≤ V.  A day's write is |delta|-sized; reads scan the same
# rows a snapshot would; compaction (a maintenance job, like
# prune_snapshots) folds the log back into one base when file counts
# grow.  This is the LSM/table-format shape (Iceberg append snapshots,
# Delta add-files) expressed on plain parquet directories.


def log_version(index_root: str, batch_id: int | None = None) -> int | None:
    """Newest committed version of a delta-log root ≤ batch_id: the max
    over committed ``d=<n>`` delta dirs and ``base/v=<k>`` compacted
    bases.  Same reader/retry semantics as :func:`_latest_snapshot`
    (``None`` scope = newest outright)."""
    import os

    deltas = _versioned_dirs(index_root, "d")
    bases = _versioned_dirs(os.path.join(index_root, "base"), "v")
    versions = [
        v
        for src in (deltas, bases)
        for v, ok in src.items()
        if ok and (batch_id is None or v <= batch_id)
    ]
    return max(versions) if versions else None


def append_log_delta(df, index_root: str, version: int) -> None:
    """Land one day's delta rows as ``root/d=<version>`` (mode=overwrite:
    a retried batch overwrites its own crashed attempt — the same
    batch-derived-path idempotence as the snapshot sinks, with
    |delta|-sized I/O instead of an O(corpus) rewrite)."""
    df.write.mode("overwrite").parquet(f"{index_root}/d={version}")


def read_index_log(spark, index_root: str, version: int | None = None):
    """Assemble the logical index at ``version`` (None = newest) from a
    delta-log root: one multi-path parquet scan over the newest committed
    base ≤ version plus the committed deltas above it.  Returns ``None``
    when the log holds no readable rows (day 0, or every in-scope delta
    was empty) — callers seed an empty-schema frame, exactly as for a
    missing snapshot.

    The union is a SCAN, not a merge: doc-keyed index rows are disjoint
    across days by contract, so no aggregation is needed to read them.
    (The fingerprint ledger is the one consumer that would need a
    groupBy to reconstruct snapshot-shaped rows — its screen
    deliberately avoids that via ``dedup.fingerprint_log_screen``, which
    aggregates per DELTA doc, never per corpus row;
    :func:`compact_index_log` takes the groupBy as its ``merge`` arg.)"""
    import os

    v = version if version is not None else log_version(index_root)
    if v is None:
        return None
    bases = _versioned_dirs(os.path.join(index_root, "base"), "v")
    base_k = max(
        (k for k, ok in bases.items() if ok and k <= v), default=None
    )
    paths = []
    if base_k is not None:
        paths.append(f"{index_root}/base/v={base_k}")
    lo = base_k if base_k is not None else 0
    paths += [
        f"{index_root}/d={n}"
        for n, ok in sorted(_versioned_dirs(index_root, "d").items())
        if ok and lo < n <= v
    ]
    if not paths:
        return None
    try:
        return spark.read.parquet(*paths)
    except Exception:
        # every in-scope dir is empty (a committed write of a 0-row
        # frame leaves _SUCCESS and no data files) — logically an
        # empty index
        return None


def compact_index_log(
    spark, index_root: str, merge=None, delete_old: bool = True
) -> int | None:
    """Fold a delta log back into one base: read the logical index at the
    newest committed version V, apply ``merge`` (e.g. the fingerprint
    ledger's groupBy-sum/min; None = plain rewrite), commit it as
    ``base/v=V``, then delete the version-≤V dirs it subsumes.  Returns
    V (None if the log is empty).

    Crash-safe by the same gate as everything else: a torn ``base/v=V``
    is invisible, and the moment it commits the reader rule (newest base
    k, deltas > k) stops consulting the old dirs — deletion afterwards
    is pure space reclamation.  Run it OUTSIDE the writer (a maintenance
    job, like :func:`prune_snapshots`); dirs NEWER than V (an in-flight
    day) are never touched."""
    import os
    import shutil

    v = log_version(index_root)
    if v is None:
        return None
    df = read_index_log(spark, index_root, v)
    if df is None:
        return None
    out = merge(df) if merge is not None else df
    out.write.mode("overwrite").parquet(f"{index_root}/base/v={v}")
    if delete_old:
        for n in _versioned_dirs(index_root, "d"):
            if n <= v:
                shutil.rmtree(f"{index_root}/d={n}")
        for k in _versioned_dirs(os.path.join(index_root, "base"), "v"):
            if k < v:
                shutil.rmtree(f"{index_root}/base/v={k}")
    return v


def stats_index_sink(
    index_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    bigrams: bool = True,
):
    """``foreachBatch`` twin of ``text.corpus_stats_index_merge``: each
    micro-batch of documents folds its (vocabulary-bounded) count index
    into the persisted corpus-statistics snapshot — the streaming
    maintenance path for the q235/q236/q238 quality-gate and DSIR
    statistics.  Same batch-id-versioned retry-idempotence discipline as
    the other index sinks; post-drain the newest snapshot ≡ one batch
    ``corpus_stats_index`` over all documents (tests/test_streaming.py).
    Documents must arrive exactly once across batches (the disjoint-set
    merge contract — put ``fingerprint_index_sink`` in front to screen
    re-deliveries)."""
    from streaming_feature_store_spark.operators.text import (
        corpus_stats_index,
        corpus_stats_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = corpus_stats_index(batch_df, id_col, text_col, bigrams)
        v = _latest_snapshot(index_root, batch_id)
        if v is None:
            updated = delta
        else:
            updated = corpus_stats_index_merge(
                spark.read.parquet(f"{index_root}/v={v}"), delta
            )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )

    return _handle


def postings_index_sink(
    index_root: str, text_col: str = "text", id_col: str = "doc_id"
):
    """``foreachBatch`` twin of ``text.postings_index_merge`` — streaming
    maintenance of the BM25 inverted index (q237): each batch's postings
    + per-doc length rows fold into the versioned snapshot (pure append
    for disjoint docs; the sum also keeps a split-across-batches doc
    correct).  Same retry-idempotence discipline; post-drain snapshot ≡
    one batch ``postings_index`` over all documents."""
    from streaming_feature_store_spark.operators.text import (
        postings_index,
        postings_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = postings_index(batch_df, id_col, text_col)
        v = _latest_snapshot(index_root, batch_id)
        if v is None:
            updated = delta
        else:
            updated = postings_index_merge(
                spark.read.parquet(f"{index_root}/v={v}"), delta, id_col
            )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )

    return _handle


def line_freq_index_sink(
    index_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
):
    """``foreachBatch`` twin of ``text.line_freq_index_merge`` (VERDICT
    r10 next-item #3) — streaming maintenance of the CCNet boilerplate
    line-frequency index: each batch's distinct-doc line counts fold
    into the versioned snapshot (union+sum keyed by line), so a
    streaming line-dedup gate (``line_dedup_from_index`` against the
    newest snapshot) never re-segments history.  Same batch-id-versioned
    retry-idempotence discipline as the other index sinks; post-drain
    snapshot ≡ one batch ``line_freq_index`` over all documents.
    Documents must arrive exactly once across batches (the disjoint-set
    contract — screen re-deliveries with ``fingerprint_index_sink``)."""
    from streaming_feature_store_spark.operators.text import (
        line_freq_index,
        line_freq_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = line_freq_index(batch_df, id_col, text_col, line_sep)
        v = _latest_snapshot(index_root, batch_id)
        if v is None:
            updated = delta
        else:
            updated = line_freq_index_merge(
                spark.read.parquet(f"{index_root}/v={v}"), delta
            )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )

    return _handle


def ngram_df_index_sink(
    index_root: str,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` twin of ``text.ngram_doc_freq_index_merge``
    (VERDICT r10 next-item #3) — streaming maintenance of the
    boilerplate-phrase n-gram document-frequency index: distinct-doc
    gram counts (and the NULL-gram corpus-size row) are additive, so
    each batch is one union+sum and ``boilerplate_from_index`` reads the
    newest snapshot as a closed form.  Same snapshot discipline and
    disjoint-doc contract as :func:`line_freq_index_sink`."""
    from streaming_feature_store_spark.operators.text import (
        ngram_doc_freq_index,
        ngram_doc_freq_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        delta = ngram_doc_freq_index(batch_df, n, id_col, text_col)
        v = _latest_snapshot(index_root, batch_id)
        if v is None:
            updated = delta
        else:
            updated = ngram_doc_freq_index_merge(
                spark.read.parquet(f"{index_root}/v={v}"), delta
            )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )

    return _handle


def decontam_hits_sink(
    hits_root: str,
    eval_index_path: str,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """``foreachBatch`` twin of ``curation.decontam_hits_merge`` — the
    streaming decontamination ledger: training documents arrive in
    micro-batches, each folds its n-gram collisions against the STATIC
    persisted eval index (``curation.decontam_index`` written once to
    ``eval_index_path``) into the versioned hit set.  The state is
    monotone and bounded by the eval suite forever; a batch's cost is
    shingling the batch.  Same batch-id-versioned retry-idempotence
    discipline as the other index sinks; post-drain the newest snapshot
    ≡ the one-shot ``decontaminate(all train, eval)`` hit pairs
    (tests/test_r11_ops.py)."""
    from streaming_feature_store_spark.operators.curation import (
        decontam_hits_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        eval_index = spark.read.parquet(eval_index_path)
        v = _latest_snapshot(hits_root, batch_id)
        hits = spark.read.parquet(f"{hits_root}/v={v}") if v is not None else None
        updated = decontam_hits_merge(
            hits, batch_df, eval_index, n, id_col, text_col
        )
        updated.write.mode("overwrite").parquet(
            f"{hits_root}/v={batch_id + 1}"
        )

    return _handle


def winnow_index_sink(
    index_root: str,
    pairs_root: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    threshold: float = 0.5,
):
    """``foreachBatch`` twin of ``text.winnow_index_merge`` (VERDICT r10
    next-item #3) — the streaming substring-containment gate: each
    batch fingerprints ONLY itself, joins the persisted ``(doc, sel)``
    winnowing index, lands its containment pairs under
    ``pairs_root/batch=<id>`` and the unioned index as the next
    snapshot.  Emit-then-upsert mirrors :func:`minhash_index_sink`
    (pairs are the actionable screen; the index is the state), with the
    same retry discipline — both writes are batch-derived overwrite
    paths.  Post-drain contract: ``union(all pairs batches) ≡
    winnow_containment_pairs(all docs)`` — every pair involves at least
    one batch's docs because EVERY doc arrives in some batch, so no
    pair is history-only (tests/test_r11_ops.py)."""
    from streaming_feature_store_spark.operators.text import (
        _winnow_sel,
        winnow_index_merge,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        v = _latest_snapshot(index_root, batch_id)
        if v is None:
            # empty index with the exact fingerprint schema: the merge
            # then yields the batch's own (delta-delta) pairs
            index = _winnow_sel(batch_df.limit(0), text_col, id_col, k, w)
        else:
            index = spark.read.parquet(f"{index_root}/v={v}")
        new_pairs, updated = winnow_index_merge(
            batch_df, index, id_col, text_col, k, w, threshold
        )
        updated.write.mode("overwrite").parquet(
            f"{index_root}/v={batch_id + 1}"
        )
        new_pairs.write.mode("overwrite").parquet(
            f"{pairs_root}/batch={batch_id}"
        )

    return _handle
