"""Z-order layout: correctness of the Morton interleave and the actual
file-skipping payoff, measured from parquet footer statistics."""

import pyspark.sql.functions as F

from excel_to_database_spark.sync.layout import (
    files_overlapping_box,
    zorder_value,
    zorder_write,
)

def test_zorder_value_interleaves_bits(spark):
    """With 2 columns at 2 bits: z = y1 x1 y0 x0 (x gets even bit
    positions, y odd) — checked against hand-computed Morton codes."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (2, 1)], "x long, y long"
    )
    z = zorder_value([F.col("x"), F.col("y")], bits=2)
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", z.alias("z")).collect()}
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (3, 3): 15, (2, 1): 6}


def test_zorder_value_bit_budget():
    import pytest

    with pytest.raises(ValueError):
        zorder_value([F.lit(1).cast("bigint")] * 4, bits=16)


def test_zorder_write_skips_files_on_2d_box(spark, sf_dir, tmp_path):
    """The payoff claim: for a 2-D box predicate, a Z-ordered layout
    lets min/max file stats skip most files, while a 1-D sorted layout
    (clustered on only the first column) cannot skip on the second.
    Verified from real parquet footers, not the plan."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    # wide on the lead column, narrow on the second — the shape where a
    # 1-D sort cannot skip anything but a Z-order can
    lo_p, hi_p = 100, 1700
    lo_s, hi_s = 5, 20
    n_files = 16

    zpath = str(tmp_path / "zorder")
    zorder_write(l, zpath, ["l_partkey", "l_suppkey"], n_files=n_files, bits=16)
    lpath = str(tmp_path / "linear")
    (
        l.repartitionByRange(n_files, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    box = {"l_partkey": (lo_p, hi_p), "l_suppkey": (lo_s, hi_s)}
    z_hit, z_total = files_overlapping_box(zpath, box)
    lin_hit, lin_total = files_overlapping_box(lpath, box)
    assert z_total == n_files and lin_total == n_files
    # z-order skips at least half the files; the 1-D layout can only
    # skip on l_partkey, so it reads strictly more
    assert z_hit <= n_files // 2
    assert z_hit < lin_hit

    # layout change must not change the data
    orig = l.agg(F.sum("l_quantity"), F.count(F.lit(1))).collect()
    z = spark.read.parquet(zpath).agg(F.sum("l_quantity"), F.count(F.lit(1))).collect()
    assert orig == z


def test_zorder_interleave_roundtrip(spark):
    """Property: de-interleaving the Morton code recovers the original
    normalized coordinates for every pair in a 32x32 grid."""
    import pyspark.sql.functions as F

    df = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("bigint").alias("y")
    )
    z = zorder_value([F.col("x"), F.col("y")], bits=5)
    # de-interleave in the same expression language
    def deinter(zc, offset, bits):
        out = F.lit(0).cast("bigint")
        for i in range(bits):
            out = out + F.shiftleft(
                F.shiftright(zc, 2 * i + offset).bitwiseAND(F.lit(1)), i
            )
        return out

    got = df.select(
        "x", "y", deinter(z, 0, 5).alias("rx"), deinter(z, 1, 5).alias("ry")
    )
    assert got.filter((F.col("x") != F.col("rx")) | (F.col("y") != F.col("ry"))).count() == 0


def test_write_training_shards(spark, sf_dir, tmp_path):
    """Size-bounded deterministic shard export: every shard stays under
    the planned row bound, shards hold contiguous key ranges sorted
    within, the union equals the input exactly, and a re-export
    produces byte-identical shard assignment (determinism)."""
    import glob

    from excel_to_database_spark.sync.layout import write_training_shards

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "shards")
    stats = write_training_shards(
        docs, out, order_col="doc_id", target_bytes=64 * 1024
    )
    assert stats["rows"] == docs.count()
    assert stats["n_shards"] > 1

    files = sorted(glob.glob(f"{out}/*.parquet"))
    assert files
    per_file = []
    for f in files:
        rows = [r["doc_id"] for r in spark.read.parquet(f"file://{f}").collect()]
        assert rows == sorted(rows)  # sorted within shard
        per_file.append((min(rows), max(rows), len(rows)))
    # contiguous, non-overlapping key ranges across shards
    spans = sorted(per_file)
    for (lo1, hi1, _), (lo2, hi2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2
    # planned row bound honored
    rows_bound = max(n for _, _, n in per_file)
    back = spark.read.parquet(out)
    assert back.count() == stats["rows"]
    assert rows_bound * (stats["n_shards"] - 1) < stats["rows"] + rows_bound

    # union equals input
    assert (
        back.select("doc_id").exceptAll(docs.select("doc_id")).count() == 0
        and docs.select("doc_id").exceptAll(back.select("doc_id")).count() == 0
    )

    # determinism: re-export yields the same shard spans
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, order_col="doc_id", target_bytes=64 * 1024)
    spans2 = sorted(
        (
            min(x),
            max(x),
            len(x),
        )
        for f in sorted(glob.glob(f"{out2}/*.parquet"))
        for x in [[r["doc_id"] for r in spark.read.parquet(f"file://{f}").collect()]]
    )
    assert spans2 == spans
