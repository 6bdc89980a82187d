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
