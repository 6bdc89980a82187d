"""Frequency/membership sketches: count-min and Bloom, built from the
same md5 hash family as the dedup/sampling operators — deterministic,
engine-portable (a DuckDB oracle reproduces every counter bit-for-bit),
no RNG state.

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

def _bucket(item: Column, seed, width: int) -> Column:
    """16-bit md5 bucket of ``seed:item`` reduced mod ``width`` — the
    same primitive (and the same DuckDB spelling) as text.hash_bucket."""
    seed_str = seed.cast("string") if isinstance(seed, Column) else F.lit(str(seed))
    h = F.conv(
        F.substring(
            F.md5(F.concat(seed_str, F.lit(":"), item.cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("int")
    return h % width


def cms_build(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of ``item_col``'s frequency distribution:
    ``depth`` hash rows × ``width`` counters as a (seed, bucket, cnt)
    frame. One explode (depth copies of the key column only — never the
    full row) + one map-side-combinable aggregation."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    keyed = df.select(F.col(item_col).alias("__item")).select("__item", seeds)
    return (
        keyed.select(
            "seed", _bucket(F.col("__item"), F.col("seed"), width).alias("bucket")
        )
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
    seeds = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("seed")
    probe_buckets = (
        probes.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", seeds)
        .select(
            "item", "seed", _bucket(F.col("item"), F.col("seed"), width).alias("bucket")
        )
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
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    return (
        df.select(F.col(item_col).alias("__item"))
        .select("__item", seeds)
        .select("seed", _bucket(F.col("__item"), F.col("seed"), n_bits).alias("bit"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, item_col: str, n_hashes: int = 3,
    n_bits: int = 4096,
) -> DataFrame:
    """Probe: an item is (possibly) a member iff ALL of its bit
    positions are lit — no false negatives, bounded false positives.
    Returns (item, bloom_hit boolean). The bit set broadcasts."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    probe_bits = (
        probes.select(F.col(item_col).alias("item"))
        .distinct()
        .select("item", seeds)
        .select("item", "seed", _bucket(F.col("item"), F.col("seed"), n_bits).alias("bit"))
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
