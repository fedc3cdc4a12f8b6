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
    """Unpersist every tracked intermediate since the last release.  Safe
    to call any time after the consuming action; returns the number of
    frames released."""
    n = 0
    while _CACHED_INTERMEDIATES:
        f = _CACHED_INTERMEDIATES.pop()
        try:
            f.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
