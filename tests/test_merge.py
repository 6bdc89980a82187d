import datetime as dt

import pyspark.sql.functions as F

from excel_to_database_spark.sync.merge import merge_upsert, scd2_apply, scd2_init


def test_merge_upsert(spark):
    t0 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    t0.write.mode("overwrite").saveAsTable("m_target")
    updates = spark.createDataFrame([(2, "B"), (4, "d")], "id long, v string")
    merge_upsert(spark, "m_target", updates, key="id")
    got = {r["id"]: r["v"] for r in spark.table("m_target").collect()}
    assert got == {1: "a", 2: "B", 3: "c", 4: "d"}


def test_scd2_history(spark):
    base = spark.createDataFrame(
        [(1, "alice", dt.datetime(2024, 1, 1)), (2, "bob", dt.datetime(2024, 1, 1))],
        "id long, name string, updated_at timestamp",
    )
    scd2_init(base, "updated_at").write.mode("overwrite").saveAsTable("s_target")

    upd = spark.createDataFrame(
        [(1, "ALICE", dt.datetime(2024, 2, 1))],
        "id long, name string, updated_at timestamp",
    )
    scd2_apply(spark, "s_target", upd, key="id", effective_ts="updated_at")

    rows = spark.table("s_target").orderBy("id", "valid_from").collect()
    assert len(rows) == 3
    v1, v2 = [r for r in rows if r["id"] == 1]
    assert (v1["name"], v1["is_current"]) == ("alice", False)
    assert v1["valid_to"] == dt.datetime(2024, 2, 1)  # closed at update time
    assert (v2["name"], v2["is_current"], v2["valid_to"]) == ("ALICE", True, None)
    bob = [r for r in rows if r["id"] == 2][0]
    assert (bob["name"], bob["is_current"]) == ("bob", True)  # untouched

    # second change to the same key extends the chain
    upd2 = spark.createDataFrame(
        [(1, "Alice2", dt.datetime(2024, 3, 1))],
        "id long, name string, updated_at timestamp",
    )
    scd2_apply(spark, "s_target", upd2, key="id", effective_ts="updated_at")
    hist = spark.table("s_target").filter(F.col("id") == 1).orderBy("valid_from").collect()
    assert [r["name"] for r in hist] == ["alice", "ALICE", "Alice2"]
    assert [r["is_current"] for r in hist] == [False, False, True]
    assert hist[1]["valid_to"] == dt.datetime(2024, 3, 1)


def test_scd2_multiversion_batch_chains(spark):
    """A batch carrying several versions of one key produces a
    contiguous, non-overlapping validity chain with one current row."""
    base = spark.createDataFrame(
        [(1, "x", dt.datetime(2024, 1, 1))], "id long, v string, ts timestamp"
    )
    scd2_init(base, "ts").write.mode("overwrite").saveAsTable("s_multi")
    upd = spark.createDataFrame(
        [(1, "y", dt.datetime(2024, 2, 1)), (1, "z", dt.datetime(2024, 3, 1))],
        "id long, v string, ts timestamp",
    )
    scd2_apply(spark, "s_multi", upd, key="id", effective_ts="ts")
    rows = spark.table("s_multi").orderBy("valid_from").collect()
    assert [(r["v"], r["is_current"]) for r in rows] == [
        ("x", False), ("y", False), ("z", True)
    ]
    assert rows[0]["valid_to"] == rows[1]["valid_from"]
    assert rows[1]["valid_to"] == rows[2]["valid_from"]


def test_merge_dynamic_partition_overwrite(spark, tmp_path):
    """Partitioned merge rewrites only the touched partition — files in
    untouched partitions stay physically identical."""
    import glob
    import os

    df = spark.createDataFrame(
        [(1, "a", 2023), (2, "b", 2023), (3, "c", 2024)],
        "id long, v string, yr int",
    )
    df.write.mode("overwrite").partitionBy("yr").saveAsTable("m_part")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    untouched = sorted(glob.glob(f"{wh}/m_part/yr=2023/*.parquet"))
    mtimes_before = [os.path.getmtime(p) for p in untouched]

    upd = spark.createDataFrame([(3, "C", 2024), (4, "d", 2024)], "id long, v string, yr int")
    conf_before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    merge_upsert(spark, "m_part", upd, key="id", partition_col="yr")

    got = {r["id"]: r["v"] for r in spark.table("m_part").collect()}
    assert got == {1: "a", 2: "b", 3: "C", 4: "d"}
    assert [os.path.getmtime(p) for p in sorted(glob.glob(f"{wh}/m_part/yr=2023/*.parquet"))] == mtimes_before
    # dynamic overwrite is scoped to the writer, never leaked to the session
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode") == conf_before
    # staging table is cleaned up
    assert not spark.catalog.tableExists("m_part__rewrite_tmp")


def test_compact_table(spark):
    """Compaction reduces file count without changing data."""
    import glob

    from excel_to_database_spark.sync.merge import compact_table

    df = spark.range(0, 1000).withColumnRenamed("id", "k").repartition(16)
    df.write.mode("overwrite").saveAsTable("m_compact")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert len(glob.glob(f"{wh}/m_compact/*.parquet")) >= 16

    compact_table(spark, "m_compact", 2)
    assert len(glob.glob(f"{wh}/m_compact/*.parquet")) <= 2
    assert spark.table("m_compact").count() == 1000
    got = {r["k"] for r in spark.table("m_compact").collect()}
    assert got == set(range(1000))


def test_table_diff_classification_and_null_semantics(spark):
    from excel_to_database_spark.sync.merge import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (4, None, 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged -> filtered out
         (2, "b", None),          # NULL == NULL -> unchanged
         (3, "zz", 30.0),         # one column changed
         (5, "e", 50.0)],         # added; 4 removed
        "k long, s string, v double",
    )
    out = {r["k"]: (r["change"], r["changed_cols"])
           for r in table_diff(old, new, keys=["k"]).collect()}
    assert out == {
        3: ("changed", "s"),
        4: ("removed", ""),
        5: ("added", ""),
    }
    # NULL -> value IS a change, and multiple columns list name-sorted
    new2 = spark.createDataFrame([(2, "x", 9.0)], "k long, s string, v double")
    out2 = {r["k"]: (r["change"], r["changed_cols"])
            for r in table_diff(old.filter("k = 2"), new2, keys=["k"]).collect()}
    assert out2 == {2: ("changed", "s,v")}


def test_schema_diff(spark):
    from excel_to_database_spark.sync.merge import schema_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k long, s string, v double")
    new = spark.createDataFrame([(1, 2, True)], "k long, s int, w boolean")
    out = {r["column"]: (r["change"], r["old_type"], r["new_type"])
           for r in schema_diff(old, new).collect()}
    assert out == {
        "s": ("type_changed", "string", "int"),
        "v": ("removed", "double", None),
        "w": ("added", None, "boolean"),
    }
    assert schema_diff(old, old).count() == 0
