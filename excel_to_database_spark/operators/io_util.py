"""Small shared I/O helpers for incrementally maintained on-disk
assets (indexes, label stores, health logs) whose directories
legitimately may not exist yet."""

from __future__ import annotations


def _local_path(spark, path: str) -> str | None:
    """Return the driver-local filesystem path for ``path`` when a
    driver-side stat is AUTHORITATIVE for it, else None.

    Authoritative means: the master is ``local*`` (on a multi-node
    cluster even a ``file:`` URI can name a shared mount that is
    present on the executors but absent on the driver, so a driver
    stat is never trusted there), AND the path carries an explicit
    ``file:`` scheme (any slash count — ``file:/x``, ``file:///x``)
    or is scheme-less with the Hadoop ``fs.defaultFS`` on the local
    filesystem. A scheme-less path on a cluster whose defaultFS is
    HDFS/S3 resolves REMOTELY inside Spark, so a local stat there
    would misreport an existing asset as absent — the silent-rebuild
    hazard the IVF-PQ index gate documents. Non-authoritative paths
    return None and take the Spark probe."""
    try:
        if not spark.sparkContext.master.startswith("local"):
            return None
    except Exception:
        return None
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

    # os.path.exists, not isdir: a single parquet FILE is a perfectly
    # readable spark.read.parquet target, and misreporting it as
    # absent would feed the build-once gates the exact silent-rebuild
    # hazard this module exists to avoid (round-11 advisor finding).
    local = _local_path(spark, path)
    if local is not None and not os.path.exists(local):
        return None
    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return None


def parquet_exists(spark, path: str) -> bool:
    """True when ``path`` is a readable parquet dir (same probe-free
    local fast path as :func:`maybe_read_parquet`)."""
    return maybe_read_parquet(spark, path) is not None
