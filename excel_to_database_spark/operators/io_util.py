"""Small shared I/O helpers for incrementally maintained on-disk
assets (indexes, label stores, health logs) whose directories
legitimately may not exist yet."""

from __future__ import annotations


def maybe_read_parquet(spark, path: str):
    """Read a parquet dir that may not exist yet (the first batch of
    an incrementally maintained index), returning None when absent.

    A bare ``spark.read.parquet`` on a missing path logs the
    FileStreamSink metadata probe's FileNotFoundException stack trace
    at WARN *before* raising the AnalysisException the caller would
    catch — ~10 lines of Java noise per first-touch that buries real
    errors in sweep logs. For local paths (this sandbox, unit tests) a
    driver-side existence check avoids the probe entirely; for remote
    URIs (object stores at scale) the exception path is the only
    portable check, so it remains as the fallback."""
    import os

    from pyspark.errors import AnalysisException

    local = path.split("://", 1)
    if len(local) == 1 or local[0] == "file":
        if not os.path.isdir(local[-1]):
            return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def parquet_exists(spark, path: str) -> bool:
    """True when ``path`` is a readable parquet dir (same probe-free
    local fast path as :func:`maybe_read_parquet`)."""
    return maybe_read_parquet(spark, path) is not None
