"""Multi-dimensional data layout: Z-order (Morton-curve) clustering.

Parquet scans skip whole files/row-groups whose column min/max ranges
don't overlap the predicate. A plain sort clusters ONE column — a
filter on any other column overlaps every file. Interleaving the bits
of several columns (the Z-order curve) keeps every interleaved
column's value range narrow within each file, so 2-D box predicates
skip most files. This is the standard lakehouse OPTIMIZE/ZORDER
maintenance operation, expressed as pure DataFrame ops.

Scale design: the only driver-side work is one min/max aggregate per
layout call (2 values per column — map-side combinable, bytes of
result). The z-value is a JVM bit-arithmetic expression; the write is
``repartitionByRange`` on z (sampled range boundaries, balanced
files) + ``sortWithinPartitions`` so row-group stats inside each file
stay tight too. Nothing ever collects data rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _normalize(col: Column, lo, hi, bits: int) -> Column:
    """Scale a numeric column to an integer rank in [0, 2^bits): the
    per-column quantization that makes bit-interleaving meaningful.
    A constant column (hi == lo) maps to 0."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("bigint")
    scale = (2**bits - 1) / span
    return F.floor((col.cast("double") - float(lo)) * F.lit(scale)).cast("bigint")


def zorder_value(norm_cols: list[Column], bits: int) -> Column:
    """Morton interleave of pre-normalized integer columns: output bit
    ``i * n_cols + c`` = bit ``i`` of column ``c``. Total bits must fit
    a signed 64-bit value, so ``bits * len(cols) <= 62``."""
    n = len(norm_cols)
    if bits * n > 62:
        raise ValueError(f"bits*cols = {bits * n} exceeds 62-bit budget")
    z = F.lit(0).cast("bigint")
    for c_idx, col in enumerate(norm_cols):
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n + c_idx)
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Rewrite ``df`` at ``path`` clustered along the Z-order curve of
    ``cols``. One bounded min/max aggregate plans the quantization;
    ``repartitionByRange`` on the z-value balances output files and
    ``sortWithinPartitions`` tightens row-group stats within each."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    stats = df.agg(*aggs).first()
    norm = [
        _normalize(F.col(c), stats[f"__min_{c}"], stats[f"__max_{c}"], bits)
        for c in cols
    ]
    (
        df.withColumn("__z", zorder_value(norm, bits))
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def files_overlapping_box(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """(n_overlapping, n_total) parquet files under ``path`` whose
    per-file column min/max statistics overlap the given box predicate
    ``{col: (lo, hi)}`` — exactly the file-skipping decision a
    stats-aware scan makes. Footer-only reads (pyarrow), no data IO;
    used by tests and layout-quality reporting."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]
    n_overlap = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        schema_names = md.schema.to_arrow_schema().names
        col_range: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = schema_names[ci] if ci < len(schema_names) else col.path_in_schema
                st = col.statistics
                if st is None or name not in box:
                    continue
                cur = col_range.setdefault(name, [st.min, st.max])
                cur[0] = min(cur[0], st.min)
                cur[1] = max(cur[1], st.max)
        overlaps = all(
            name in col_range
            and not (col_range[name][1] < lo or col_range[name][0] > hi)
            for name, (lo, hi) in box.items()
        )
        if overlaps:
            n_overlap += 1
    return n_overlap, len(files)


def write_training_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    target_bytes: int = 256 * 1024 * 1024,
    bytes_col: str | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict:
    """Export a corpus as SIZE-BOUNDED, DETERMINISTICALLY-ORDERED
    shards — the layout a training run consumes (fixed shard
    byte-budget for loader memory, a total order over shards +
    within-shard rows so every epoch and every re-export sees the same
    sequence, and shard count ∝ corpus size for read parallelism).

    Sizing is planned from ONE aggregate (row count + total payload
    bytes — map-side combinable, no sampling, so the plan is
    deterministic for a fixed corpus): rows-per-shard =
    target_bytes / avg-row-bytes. ``bytes_col`` names the dominant
    payload column (defaults to the first string/binary column);
    parquet compression makes on-disk shards smaller than the budget —
    the bound is on RAW payload, the number the training loader's
    memory actually sees.

    Layout = ``repartitionByRange(n_shards, order_col)`` (balanced
    contiguous key ranges — also tight min/max stats per shard for
    predicate skipping) + ``sortWithinPartitions(order_col)``.

    Determinism contract, precisely: with a UNIQUE ``order_col`` the
    TOTAL ROW SEQUENCE (shards read in range order, rows in sorted
    order within each) is identical on every re-export — that is the
    sequence a training epoch consumes. Shard BOUNDARY placement,
    however, comes from RangePartitioner's reservoir sampling, whose
    seed derives from the RDD id — stable within a session for a fixed
    plan, but NOT guaranteed across sessions or plan changes, so a
    re-export may cut the same total sequence into slightly different
    shard files (byte-identical shard files are not guaranteed).
    Returns {"n_shards", "rows", "payload_bytes"}."""
    if bytes_col is None:
        bytes_col = next(
            (c for c, t in df.dtypes if t in ("string", "binary")),
            None,
        )
    size_expr = (
        F.lit(64)
        if bytes_col is None
        else F.coalesce(F.length(F.col(bytes_col)), F.lit(0)) + 64
    )
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(size_expr).cast("bigint").alias("b"),
    ).collect()[0]
    rows, payload = int(stats["n"]), int(stats["b"] or 0)
    if rows == 0:
        df.write.mode(mode).format(fmt).save(path)
        return {"n_shards": 0, "rows": 0, "payload_bytes": 0}
    rows_per_shard = max(1, int(target_bytes // max(1, payload // rows)))
    n_shards = max(1, -(-rows // rows_per_shard))
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .sortWithinPartitions(order_col)
        .write.mode(mode)
        .format(fmt)
        .option("maxRecordsPerFile", rows_per_shard)
        .save(path)
    )
    return {"n_shards": n_shards, "rows": rows, "payload_bytes": payload}
