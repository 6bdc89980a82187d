"""Bucketed catalog tables — co-located joins and aggregations.

Writing both sides of a recurring join bucketed (and sorted) by the
join key lets Spark read pre-partitioned data: the join plans with NO
Exchange on either side (sort-merge over bucketed scans), which at
100 TB removes the dominant cost of fact-fact joins that repeat across
a pipeline. Aggregations on the bucket key likewise skip their shuffle.

This is the static complement to AQE: AQE fixes one query at runtime;
bucketing amortizes the shuffle across every query that touches the
table. ``tests/test_bucketing.py`` asserts the no-Exchange plan."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) catalog table.
    ``n_buckets`` should match the downstream parallelism target — both
    join sides must use the SAME count for exchange-free joins."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
