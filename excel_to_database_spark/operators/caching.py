"""Cache-lifetime registry for operator-internal persists.

Several operators pin intermediates (shingle inverted indexes, banded
LSH signatures, IVF assignments) because the frame feeds 2-3 consumers
inside one query plan. Those persists previously accumulated across a
long session running many queries; this registry makes the lifetime
explicit: operators register what they pin, callers (or a session-level
sweep) call :func:`evict_caches` after the consuming action.

The registry holds the DataFrame reference only until eviction — it is
an eviction hook, not a cache manager; Spark's own LRU still governs
block storage pressure in between.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ACTIVE: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` MEMORY_AND_DISK and register it for later
    :func:`evict_caches`. Returns the persisted frame."""
    from pyspark.storagelevel import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _ACTIVE.append(out)
    return out


def evict_caches() -> int:
    """Unpersist every operator-pinned cache registered since the last
    eviction (blocking=False — Spark frees the blocks asynchronously).
    Returns the number of frames evicted. Safe to call at any time;
    in-flight queries that still reference an evicted frame simply
    recompute it."""
    n = 0
    while _ACTIVE:
        _ACTIVE.pop().unpersist()
        n += 1
    return n
