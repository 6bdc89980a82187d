"""Cache-lifetime registry for operator-internal persists.

Several operators pin intermediates (shingle inverted indexes, banded
LSH signatures, IVF assignments) because the frame feeds 2-3 consumers
inside one query plan. Those persists previously accumulated across a
long session running many queries; this registry makes the lifetime
explicit: operators register what they pin, callers (or a session-level
sweep) call :func:`evict_caches` after the consuming action.

The registry holds WEAK references: a caller that never calls
:func:`evict_caches` (a long-lived library session) doesn't leak — once
the caller drops its last strong reference, the DataFrame is GC-eligible
exactly as with a plain ``persist()``, and Spark's ContextCleaner
reclaims the blocks. ``evict_caches`` eagerly unpersists whatever is
still live. The list is lock-guarded for concurrent query threads.
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame

_ACTIVE: list[weakref.ref] = []
_LOCK = threading.Lock()


def pin(df: DataFrame) -> DataFrame:
    """Persist ``df`` MEMORY_AND_DISK and register it (weakly) for
    later :func:`evict_caches`. Returns the persisted frame."""
    from pyspark.storagelevel import StorageLevel

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    with _LOCK:
        _ACTIVE.append(weakref.ref(out))
    return out


def evict_caches() -> int:
    """Unpersist every operator-pinned cache registered since the last
    eviction (blocking=False — Spark frees the blocks asynchronously).
    Returns the number of still-live frames evicted (GC-collected
    entries are dropped silently). Safe to call at any time; in-flight
    queries that still reference an evicted frame simply recompute
    it."""
    with _LOCK:
        refs, _ACTIVE[:] = _ACTIVE[:], []
    n = 0
    for r in refs:
        df = r()
        if df is not None:
            df.unpersist()
            n += 1
    return n
