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
