"""Frequency/membership sketches: count-min and Bloom, built from a
single-digest md5 field family (hash each item once; row d uses the
d-th disjoint 16-bit hex field) — deterministic, engine-portable (a
DuckDB oracle reproduces every counter bit-for-bit), no RNG state.

Scale design: both sketches are one map-side-combinable aggregation
over the data; the sketch itself is O(depth × width) / O(bits) rows —
independent of data volume — so it broadcasts for the probe join. This
is the constant-memory answer to "how often does X occur" /
"have we seen X" at 100 TB, where exact per-key state would be another
full shuffle of the corpus.

Count-min guarantee: estimate ≥ true count always (only collisions can
inflate, never deflate); estimate ≤ true + εN with high probability for
width ≈ e/ε. The ≥ bound is deterministic and is asserted per-row by
the oracle query; the error tail is asserted in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _bucket_array(n: int, width: int) -> Column:
    """``n`` buckets from ONE digest column ``__h``: row d's bucket is
    the d-th disjoint 16-bit hex field of md5(item), mod ``width`` —
    one md5 per input row instead of one per (row, seed), the same
    single-digest family trick as the MinHash rotations. Disjoint
    fields of a uniform digest are independent uniform 16-bit values
    (n ≤ 8, width ≤ 65536); the construction is plain substring math,
    so DuckDB oracles reproduce every counter."""
    if n > 8:
        raise ValueError("digest supplies at most 8 independent 16-bit fields")
    return F.array(
        *[
            F.conv(F.substring("__h", 4 * d + 1, 4), 16, 10).cast("int") % width
            for d in range(n)
        ]
    )


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``item_col``'s frequency distribution:
    ``depth`` hash rows × ``width`` counters as a (seed, bucket, cnt)
    frame. One md5 per row, one posexplode of the derived bucket array
    (never the full row), one map-side-combinable aggregation."""
    staged = df.select(F.md5(F.col(item_col).cast("string")).alias("__h"))
    return (
        staged.select(F.posexplode(_bucket_array(depth, width)).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for each distinct probe item:
    min over hash rows of the counter each row maps the item to.
    The sketch is depth×width rows → broadcast; the probe never
    shuffles more than (item, seed) pairs. ``depth``/``width`` must
    match the build call — taken as parameters so plan construction
    stays job-free (no driver probe of the sketch)."""
    probe_buckets = (
        probes.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", F.md5(F.col("item").cast("string")).alias("__h"))
        .select("item", F.posexplode(_bucket_array(depth, width)).alias("seed", "bucket"))
    )
    return (
        probe_buckets.join(F.broadcast(sketch), ["seed", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("bigint").alias("cms_est"))
    )


def bloom_build(
    df: DataFrame, item_col: str, n_hashes: int = 3, n_bits: int = 4096
) -> DataFrame:
    """Bloom filter membership set: the distinct (seed, bit) positions
    lit by the items. Size ≤ n_hashes × n_bits rows regardless of data
    volume."""
    return (
        df.select(F.md5(F.col(item_col).cast("string")).alias("__h"))
        .select(F.posexplode(_bucket_array(n_hashes, n_bits)).alias("seed", "bit"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, item_col: str, n_hashes: int = 3,
    n_bits: int = 4096,
) -> DataFrame:
    """Probe: an item is (possibly) a member iff ALL of its bit
    positions are lit — no false negatives, bounded false positives.
    Returns (item, bloom_hit boolean). The bit set broadcasts."""
    probe_bits = (
        probes.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", F.md5(F.col("item").cast("string")).alias("__h"))
        .select("item", F.posexplode(_bucket_array(n_hashes, n_bits)).alias("seed", "bit"))
    )
    hit = F.count(F.lit(1)) == F.sum(F.when(F.col("lit"), 1).otherwise(0))
    return (
        probe_bits.join(
            F.broadcast(bloom.withColumn("lit", F.lit(True))), ["seed", "bit"], "left"
        )
        .withColumn("lit", F.coalesce("lit", F.lit(False)))
        .groupBy("item")
        .agg(hit.alias("bloom_hit"))
    )
