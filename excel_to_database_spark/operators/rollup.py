"""Hypertable-style continuous aggregates: MERGEABLE time-bucketed
partials (the TimescaleDB continuous-aggregate / druid-rollup pattern,
re-expressed as plain DataFrames).

At 100 TB the raw event stream is written once and every dashboard
window (hour/day/week/month) is answered from PRE-AGGREGATED partials —
never by rescanning raw data. That only works if every measure in the
partial is mergeable:

  * counts and decimal sums — additive, merge by SUM;
  * distinct users — a DataSketches HLL sketch column
    (``hll_sketch_agg``), merged with ``hll_union_agg``; fixed bytes
    per bucket regardless of cardinality;
  * min/max — merge by MIN/MAX.

``time_bucket_partials`` is the table an ingest pipeline maintains
incrementally (one partial row per (bucket, key) per refresh);
``merge_partials`` answers any coarser window from it. Buckets are
integer epoch seconds (floor(epoch/width)·width) rather than engine
window types, so results stay portable across engines and the daily
bucket of an hourly partial is itself computable FROM the partial key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bucket_partials(
    events: DataFrame,
    bucket_seconds: int = 3600,
    ts: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    value: str = "value",
    distinct_col: str = "user_id",
) -> DataFrame:
    """One partial row per (bucket_start, keys): additive measures plus
    a mergeable HLL sketch of ``distinct_col``. One map-side-combinable
    hash aggregation over the raw scan — the only pass that ever
    touches raw data."""
    bucket = (
        (F.floor(F.unix_timestamp(ts) / bucket_seconds) * bucket_seconds)
        .cast("bigint")
        .alias("bucket_start")
    )
    return events.groupBy(bucket, *keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value).cast("decimal(12,2)")).alias("sum_value"),
        F.min(F.col(value)).alias("min_value"),
        F.max(F.col(value)).alias("max_value"),
        F.hll_sketch_agg(distinct_col).alias("distinct_sketch"),
    )


def compact_partials(
    spark,
    table: str,
    before_bucket: int,
    coarse_seconds: int = 86400,
    keys: tuple[str, ...] = ("event_type",),
    drop_before: int | None = None,
    exclude_batch: int | None = None,
) -> None:
    """Hypertable maintenance: rewrite the partial TABLE so buckets
    older than ``before_bucket`` collapse into ``coarse_seconds``-wide
    rows (hourly → daily), optionally dropping buckets older than
    ``drop_before`` entirely (retention). Because a merge of partials
    is itself a partial, every ``merge_partials`` answer at width ≥
    ``coarse_seconds`` over the compacted region — including the HLL
    distinct estimate, union being associative — is bit-identical
    before and after; what changes is the table's row count and file
    count (per-scan task counts stay proportional to retained data,
    not ingest history).

    Compacted rows carry ``__batch_id = -1`` (never a real micro-batch
    id), so the streaming sink's replay-dedup delete can never collide
    with them; only compact buckets old enough that their source
    batches are committed. ``exclude_batch`` pins one micro-batch's
    rows verbatim regardless of age — the streaming sink passes its
    IN-FLIGHT batch id so rows left by a crashed prior attempt of the
    same batch are never folded before the replay's partition
    overwrite replaces them (the exactly-once guarantee for late
    events older than the compaction horizon). The rewrite goes
    through the same temp-table staging as the CDC merge path
    (sync/merge._rewrite_via_temp) — never reading and overwriting the
    same files in one job."""
    from excel_to_database_spark.sync.merge import _rewrite_via_temp

    df = spark.table(table)
    cols = df.columns
    protected = (
        F.lit(False)
        if exclude_batch is None
        else F.col("__batch_id") == exclude_batch
    )
    old = df.filter((F.col("bucket_start") < before_bucket) & ~protected)
    if drop_before is not None:
        old = old.filter(F.col("bucket_start") >= drop_before)
    # protected rows survive verbatim at any age (their replay will
    # overwrite them); unprotected rows older than drop_before appear
    # in neither frame — retention
    keep = df.filter((F.col("bucket_start") >= before_bucket) | protected)
    compacted = (
        merge_partials(old, coarse_seconds, keys)
        .drop("approx_distinct")
        .withColumn("__batch_id", F.lit(-1).cast("long"))
        .select(*cols)
    )
    _rewrite_via_temp(spark, table, keep.unionByName(compacted))


def merge_partials(
    partials: DataFrame,
    bucket_seconds: int = 86400,
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Roll partials up to a coarser bucket WITHOUT touching raw data:
    sums/counts add, min/max fold, HLL sketches union. ``bucket_seconds``
    must be a multiple of the partials' own width (the coarser bucket of
    a partial is derived from its bucket_start alone). Emits the merged
    measures plus the sketch estimate; the sketch column itself is kept
    so merges compose (hour → day → week re-merges the day row)."""
    bucket = (
        (F.floor(F.col("bucket_start") / bucket_seconds) * bucket_seconds)
        .cast("bigint")
        .alias("bucket_start")
    )
    return (
        partials.groupBy(bucket, *keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.hll_union_agg("distinct_sketch").alias("distinct_sketch"),
        )
        .withColumn(
            "approx_distinct", F.hll_sketch_estimate("distinct_sketch")
        )
    )


def gapfill_locf(
    df: DataFrame,
    key_cols: tuple[str, ...],
    bucket_col: str,
    value_cols: tuple[str, ...],
    step: int,
) -> DataFrame:
    """Time-series gap fill (the TimescaleDB ``time_bucket_gapfill`` +
    ``locf`` pattern): emit one row per key per ``step``-wide bucket
    between that key's min and max observed buckets, carrying each
    value column forward from the last observed row (LOCF).
    ``is_observed`` marks real rows vs fills.

    Plan: per-key bounds come from one map-side-combinable min/max
    aggregation; the dense grid is a ``sequence`` explode of
    (max-min)/step rows per key — generated, not shuffled; the fill is
    one ordered window per key (``last(value, ignorenulls=True)``,
    running frame). A key's grid size is its own time span, so a
    sparse key never pays for a dense one, and no stage materializes
    the global calendar."""
    keys = list(key_cols)
    bounds = df.groupBy(*keys).agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
        ).alias(bucket_col),
    )
    joined = grid.join(df, keys + [bucket_col], "left").withColumn(
        "is_observed", F.col(value_cols[0]).isNotNull()
    )
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = joined
    for v in value_cols:
        out = out.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return out.select(*keys, bucket_col, *value_cols, "is_observed")


def cumulative_distinct(
    events: DataFrame,
    ts: str = "ts",
    id_col: str = "user_id",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Cumulative distinct-entity curve (the 'total users ever seen by
    day D' dashboard line) from MERGEABLE sketches: per-bucket HLL
    sketches union under an expanding window, so the curve reads from
    |buckets| fixed-size sketch rows — never a rescan of raw data per
    point, and never COUNT(DISTINCT) over an expanding frame (which no
    engine supports and a self-join emulation pays |buckets|·|raw| for).

    The expanding window is unpartitioned BY DESIGN: its input is one
    row per bucket (365/year), pre-aggregated — driver-small at any
    corpus size; the raw scan parallelism lives in the sketch
    aggregation underneath. Returns (bucket_start, cum_distinct_est);
    the estimate is a DataSketches HLL union (exactness-tolerance
    testing is the caller's concern, see q154's flag pattern)."""
    from pyspark.sql.window import Window

    bucket = (
        (F.floor(F.unix_timestamp(ts) / bucket_seconds) * bucket_seconds)
        .cast("bigint")
        .alias("bucket_start")
    )
    per_bucket = events.groupBy(bucket).agg(
        F.hll_sketch_agg(id_col).alias("sk")
    )
    w = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_bucket.select(
        "bucket_start",
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w)).alias(
            "cum_distinct_est"
        ),
    )
