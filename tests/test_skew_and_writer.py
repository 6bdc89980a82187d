import pyspark.sql.functions as F
import pytest

from excel_to_database_spark.operators.skew import salted_join
from excel_to_database_spark.sources.excel_source import read_excel
from excel_to_database_spark.sources.xlsx_writer import write_excel


def test_salted_join_matches_plain_join(spark):
    # skewed left: 10k rows on one hot key + a tail
    left = spark.range(10000).select(
        F.when(F.col("id") < 9000, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.createDataFrame([(1, "hot"), (9500, "cold")], "k long, rv string")
    plain = left.join(right, "k", "inner").select("k", "lv", "rv")
    salted = salted_join(left, right, "k", "inner", salt=8).select("k", "lv", "rv")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, lv string")
    right = spark.createDataFrame([(1, "x")], "k long, rv string")
    out = {r["k"]: r["rv"] for r in salted_join(left, right, "k", "left", salt=4).collect()}
    assert out == {1: "x", 2: None}


def test_salted_join_rejects_right_outer(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="right"):
        salted_join(df, df, "k", "full", salt=4)


def test_excel_writer_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("alice", "2021-01-01", "12.5"), ("bob", "", "7")],
        "Name string, When string, Amount string",
    )
    p = str(tmp_path / "export.xlsx")
    n = write_excel(df, p, sheet_name="Export & Co")
    assert n == 2
    back = read_excel(spark, p)
    assert back.columns == ["Name", "When", "Amount"]
    rows = {r["Name"]: r for r in back.collect()}
    assert rows["alice"]["Amount"] == "12.5"
    assert rows["bob"]["When"] == ""  # empty cell survives


def test_excel_dir_writer_roundtrip(spark, tmp_path):
    """Partition-parallel export: one workbook per non-empty partition,
    written executor-side, round-tripping through read_excel's
    directory ingest (the scale-true inverse of directory ingest)."""
    import glob

    from excel_to_database_spark.sources.xlsx_writer import write_excel_dir

    df = (
        spark.range(97)
        .select(
            F.col("id").cast("string").alias("k"),
            F.concat(F.lit("v&<"), F.col("id").cast("string")).alias("val"),
        )
        .repartition(8)
    )
    d = str(tmp_path / "export_dir")
    n = write_excel_dir(df, d)
    assert n == 97
    files = glob.glob(f"{d}/*.xlsx")
    assert 1 < len(files) <= 8  # parallel files, empty partitions skipped
    back = read_excel(spark, d)
    assert back.columns == ["k", "val"]
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_excel_dir_writer_array_column_parity(spark, tmp_path):
    """Array-typed columns: the directory writer must stringify them
    like the single-file writer instead of tripping pd.isna's
    'truth value of an array is ambiguous' (ADVICE r5) — both writers
    export the same cell text."""
    import glob

    from excel_to_database_spark.sources.xlsx_writer import (
        write_excel,
        write_excel_dir,
    )

    df = spark.createDataFrame(
        [("a", [1, 2, 3], None), ("b", [], "x")],
        "k string, arr array<int>, opt string",
    )
    single = str(tmp_path / "arr.xlsx")
    write_excel(df, single)
    d = str(tmp_path / "arr_dir")
    n = write_excel_dir(df.repartition(2), d)
    assert n == 2 and glob.glob(f"{d}/*.xlsx")
    one = read_excel(spark, single).collect()
    many = read_excel(spark, d).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))
    by_k = {r["k"]: r["arr"] for r in many}
    assert by_k["a"] == "[1, 2, 3]"


def test_excel_dir_writer_per_file_cap(spark, tmp_path):
    """The sheet cap applies per partition file; a partition over the
    cap fails with guidance to repartition."""
    from excel_to_database_spark.sources.xlsx_writer import write_excel_dir

    df = spark.range(30).select(F.col("id").cast("string").alias("x")).coalesce(1)
    with pytest.raises(Exception, match="repartition"):
        write_excel_dir(df, str(tmp_path / "cap_dir"), max_rows=10)


def test_excel_writer_cap(spark, tmp_path):
    df = spark.range(20).select(F.col("id").cast("string").alias("x"))
    with pytest.raises(ValueError, match="cap"):
        write_excel(df, str(tmp_path / "cap.xlsx"), max_rows=10)


def test_excel_unicode_and_escaping_roundtrip(spark, tmp_path):
    """Non-ASCII text and XML-special characters survive the
    writer→reader round trip."""
    df = spark.createDataFrame(
        [("café & <croissant>", "übergrößen \"quoted\""), ("日本語テキスト", "emoji 🚀 ok")],
        "a string, b string",
    )
    p = str(tmp_path / "uni.xlsx")
    write_excel(df, p)
    back = read_excel(spark, p, sanitize=False)
    got = sorted(map(tuple, back.collect()))
    assert got == [("café & <croissant>", 'übergrößen "quoted"'), ("日本語テキスト", "emoji 🚀 ok")]
