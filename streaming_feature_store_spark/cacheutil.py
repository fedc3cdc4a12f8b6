"""Tracked persists for bounded intermediates.

Several operators persist small, bounded intermediate frames because the
persist is load-bearing (Spark gives zero ReusedExchange for shared
subplans consumed by multiple branches — without the persist the lineage
rebuilds once per consumer; measured 104 s vs 50 s on bigram_pmi at 100 k
docs).  A long-lived session that calls them repeatedly would accumulate
cached lineage until LRU pressure (ADVICE r3), so every such persist is
registered here and released explicitly with
``release_cached_intermediates()`` after the consuming action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED_INTERMEDIATES: list[DataFrame] = []


def persist_tracked(frame: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    out = frame.persist(StorageLevel.MEMORY_AND_DISK)
    _CACHED_INTERMEDIATES.append(out)
    return out


def release_cached_intermediates() -> int:
    """Unpersist every tracked intermediate since the last release —
    persisted frames AND local checkpoints (``local_checkpoint_tracked``).

    Contract difference between the two kinds: a released PERSIST
    merely recomputes on the next action; a released CHECKPOINT
    invalidates every frame built on it (truncated lineage cannot
    recompute), so finish consuming checkpoint-backed results — e.g.
    ``negative_sample`` output — before calling this.  Returns the
    number of frames released."""
    n = 0
    while _CACHED_INTERMEDIATES:
        f = _CACHED_INTERMEDIATES.pop()
        try:
            f.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n + _release_checkpoints()


_CHECKPOINTED: list[tuple["object", int]] = []  # (SparkSession, rdd id)


def local_checkpoint_tracked(frame: DataFrame) -> DataFrame:
    """Eager ``localCheckpoint`` whose materialized blocks ARE released
    by ``release_cached_intermediates()``.

    ``DataFrame.unpersist`` cannot reach a local checkpoint's blocks
    (they belong to an internal RDD the public API never exposes — both
    ``df.rdd`` and ``queryExecution().toRdd()`` return derived RDDs, as
    verified empirically), so without tracking they live until JVM GC —
    the unbounded-cache-growth failure this module exists to prevent.
    The checkpointed RDD id is captured as the storage-info delta around
    the eager materialization (single-threaded driver assumption: no
    concurrent persists between the two snapshots) and released later
    through ``SparkContext.getPersistentRDDs``.

    Releasing INVALIDATES the returned frame — unlike a released
    persist, which merely recomputes, a freed checkpoint CANNOT (its
    lineage is truncated), so any later action on the frame throws.
    Consume (write/collect) checkpoint-backed results fully before
    calling ``release_cached_intermediates()``.

    The delta is filtered to RDDs literally named "MapPartitionsRDD":
    the eager checkpoint job can materialize OTHER frames' cold caches
    mid-scan, and those must not be claimed — CacheManager entries
    (``df.cache()``) carry their plan string as the RDD name, so the
    filter excludes them (raw ``rdd.persist()`` materialized
    concurrently would still be claimed; this engine has none).
    """
    sc = frame.sparkSession.sparkContext._jsc.sc()
    before = {i.id() for i in sc.getRDDStorageInfo()}
    out = frame.localCheckpoint(eager=True)
    for rid in _capture_new_checkpoint_ids(sc, before):
        _CHECKPOINTED.append((frame.sparkSession, rid))
    return out


def _capture_new_checkpoint_ids(sc, before: set) -> list[int]:
    """Ids of RDDs cached since ``before`` that are literally named
    "MapPartitionsRDD" — the local-checkpoint discriminator (CacheManager
    entries carry their plan string as the name).  Single point of truth
    for the three trackers."""
    return [
        i.id()
        for i in sc.getRDDStorageInfo()
        if i.id() not in before and i.name() == "MapPartitionsRDD"
    ]


def _unpersist_ids(sc, ids) -> int:
    """Best-effort unpersist of checkpoint RDD ids via the persistent-RDD
    registry; already-cleaned ids are skipped silently."""
    n = 0
    pm = sc.getPersistentRDDs()
    for rid in ids or []:
        try:
            opt = pm.get(rid)
            if not opt.isEmpty():
                opt.get().unpersist(False)
                n += 1
        except Exception:
            pass
    return n


def track_checkpoint_ids(session, ids) -> None:
    """Register already-captured checkpoint ids (e.g. an iteration loop's
    FINAL round, returned by ``rolling_local_checkpoint``) for release by
    ``release_cached_intermediates()`` — with the same contract: release
    only after the frames built on them are fully consumed."""
    for rid in ids or []:
        _CHECKPOINTED.append((session, rid))


def _release_checkpoints() -> int:
    n = 0
    while _CHECKPOINTED:
        session, rid = _CHECKPOINTED.pop()
        try:
            n += _unpersist_ids(session.sparkContext._jsc.sc(), [rid])
        except Exception:  # session stopped — nothing to release
            pass
    return n


def rolling_local_checkpoint(
    frame: DataFrame, prev_ids: list[int] | None
) -> tuple[DataFrame, list[int]]:
    """Iteration form of ``local_checkpoint_tracked``: eagerly checkpoint
    the round's frame, then free the PREVIOUS round's checkpoint blocks —
    once the new checkpoint is materialized (data copied, not derived),
    the superseded round can never be read again, so waiting for JVM GC
    to reclaim it just multiplies peak storage by the round count
    (measured: 10-iteration PageRank left 9 superseded (node, rank)
    checkpoints cached — O(rounds × nodes) where O(nodes) suffices).

    Same MapPartitionsRDD-name discrimination as
    ``local_checkpoint_tracked``; the FINAL round's ids are returned so
    the caller can hand them to that tracker (or leave them to GC when
    the result frame escapes to the caller, as ``pagerank`` does —
    releasing the returned frame's own blocks would invalidate it).
    """
    sc = frame.sparkSession.sparkContext._jsc.sc()
    before = {i.id() for i in sc.getRDDStorageInfo()}
    out = frame.localCheckpoint(eager=True)
    new_ids = _capture_new_checkpoint_ids(sc, before)
    _unpersist_ids(sc, prev_ids)
    return out, new_ids
