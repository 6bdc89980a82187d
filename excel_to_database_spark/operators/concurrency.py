"""Overlap independent driver-blocking build jobs (guide §2.6).

Several operators materialize an intermediate with a driver-blocking
action before the final plan can be assembled — the rank primitives'
bounded cell-count read (`selection.global_rank` /
`_group_rank_build`), eager `localCheckpoint` pins. When ONE query
needs TWO such builds that do not depend on each other (q217's
lexical and vector towers), running them sequentially leaves the
cluster idle through each job's scheduling latency and straggler
tail. Spark's scheduler happily runs several jobs at once inside one
application; actions are only sequential because driver code calls
them sequentially — submitting the independent builds from a small
thread pool lets the second job's tasks back-fill executors freed by
the first job's tail (FIFO scheduling is exactly the back-fill
behaviour wanted here).

Only for builds that are INDEPENDENT (neither reads the other's
output) and whose shared inputs are already materialized (an eager
checkpoint/persisted blocks): overlapping two thunks that would race
to compute the SAME lazy subtree duplicates that work instead — pin
the shared frame first (the q205 discipline) or keep them sequential.

`SPARK_GRAFT_OVERLAP=0` disables the pool (sequential fallback) — the
deployment knob for clusters where concurrent jobs would fight for
executors, and the A/B switch the round-16 measurements used.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from typing import Any


def overlap_builds(*thunks: Callable[[], Any]) -> list:
    """Run the given zero-arg build thunks, overlapping their Spark
    jobs via a thread pool (one thread per thunk — callers pass 2-3
    independent builds, enough to fill the tail, not so many that they
    fight for executors). Returns their results in argument order;
    the first failing thunk's exception propagates (loudly — a build
    that silently vanished would corrupt the consumer's plan).

    Results are unchanged by construction: each thunk builds exactly
    the frame it would have built sequentially; only the wall-clock
    interleaving of the build JOBS differs. Python threads share the
    SparkSession safely (py4j multiplexes; job-scoped properties are
    thread-local)."""
    if len(thunks) == 1 or os.environ.get("SPARK_GRAFT_OVERLAP", "1") == "0":
        return [th() for th in thunks]
    with ThreadPoolExecutor(max_workers=len(thunks)) as pool:
        futures = [pool.submit(th) for th in thunks]
        return [f.result() for f in futures]
