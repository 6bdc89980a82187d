"""Small shared I/O helpers for incrementally maintained on-disk
assets (indexes, label stores, health logs) whose directories
legitimately may not exist yet."""

from __future__ import annotations


def _local_path(spark, path: str) -> str | None:
    """Return the driver-local filesystem path for ``path`` when a
    driver-side stat is AUTHORITATIVE for it, else None.

    Authoritative means: the path carries an explicit ``file:`` scheme
    (any slash count — ``file:/x``, ``file:///x``), or it is
    scheme-less AND the Hadoop ``fs.defaultFS`` is the local
    filesystem. A scheme-less path on a cluster whose defaultFS is
    HDFS/S3 resolves REMOTELY inside Spark, so a local stat there
    would misreport an existing asset as absent — the silent-rebuild
    hazard the IVF-PQ index gate documents. Those paths (and every
    explicit remote URI) return None and take the Spark probe."""
    if path.startswith("file:"):
        p = path[len("file:"):]
        return "/" + p.lstrip("/") if p.startswith("/") else p
    if "://" in path or ":" in path.split("/", 1)[0]:
        return None  # explicit non-file scheme → remote
    try:
        default_fs = (
            spark.sparkContext._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///"
            )
        )
    except Exception:
        return None
    return path if str(default_fs).startswith("file:") else None


def maybe_read_parquet(spark, path: str):
    """Read a parquet dir that may not exist yet (the first batch of
    an incrementally maintained index), returning None when absent.

    A bare ``spark.read.parquet`` on a missing path logs the
    FileStreamSink metadata probe's FileNotFoundException stack trace
    at WARN *before* raising the AnalysisException the caller would
    catch — ~10 lines of Java noise per first-touch that buries real
    errors in sweep logs. When a driver-side stat is authoritative
    (see :func:`_local_path`) a missing dir short-circuits without
    the probe; remote URIs and scheme-less paths under a remote
    defaultFS always go through Spark, so an existing remote asset is
    never misreported as absent."""
    import os

    from pyspark.errors import AnalysisException

    local = _local_path(spark, path)
    if local is not None and not os.path.isdir(local):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def parquet_exists(spark, path: str) -> bool:
    """True when ``path`` is a readable parquet dir (same probe-free
    local fast path as :func:`maybe_read_parquet`)."""
    return maybe_read_parquet(spark, path) is not None
