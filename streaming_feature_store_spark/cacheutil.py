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
    persisted frames AND local checkpoints (see
    ``local_checkpoint_tracked``; released checkpoints invalidate their
    frames).  Safe to call any time after the consuming action; returns
    the number of frames released."""
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

    Releasing INVALIDATES the returned frame (lineage is truncated, so
    a freed checkpoint cannot recompute) — same consume-then-release
    contract as every tracked persist.
    """
    sc = frame.sparkSession.sparkContext._jsc.sc()
    before = {i.id() for i in sc.getRDDStorageInfo()}
    out = frame.localCheckpoint(eager=True)
    new = {i.id() for i in sc.getRDDStorageInfo()} - before
    for rid in new:
        _CHECKPOINTED.append((frame.sparkSession, rid))
    return out


def _release_checkpoints() -> int:
    n = 0
    while _CHECKPOINTED:
        session, rid = _CHECKPOINTED.pop()
        try:
            opt = session.sparkContext._jsc.sc().getPersistentRDDs().get(rid)
            if not opt.isEmpty():
                opt.get().unpersist(False)
                n += 1
        except Exception:  # session stopped — nothing to release
            pass
    return n
