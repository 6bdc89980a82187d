import pytest

from excel_to_database_spark.sources.payload import matrix_to_df
from excel_to_database_spark.sync.policy import SyncAction, decide_sync_action
from excel_to_database_spark.sync.sinks import CloudCopyDestination, LocalDestination


def test_decision_table():
    d = decide_sync_action
    assert d(None, ["a", "b"]) is SyncAction.CREATE
    assert d(["a", "b"], ["b", "a"]) is SyncAction.TRUNCATE  # reorder → same set
    assert d(["A", "B"], ["b", "a"]) is SyncAction.TRUNCATE  # case-insensitive
    assert d(["a", "b"], ["a", "b", "c"]) is SyncAction.RECREATE  # added col
    assert d(["a", "b"], ["a"]) is SyncAction.RECREATE  # dropped col
    assert d(["a", "b"], ["a", "c"]) is SyncAction.RECREATE  # renamed col


def test_strict_mode_rejects_reorder():
    with pytest.raises(ValueError):
        decide_sync_action(["a", "b"], ["b", "a"], strict=True)
    assert decide_sync_action(["a", "b"], ["a", "b"], strict=True) is SyncAction.TRUNCATE


def test_local_destination_lifecycle(spark):
    dest = LocalDestination()
    df1 = matrix_to_df(spark, [["a", "b"], ["1", "2"], ["3", "4"]])
    r1 = dest.sync(df1, "t_life", path="tenant1")
    assert (r1.action, r1.n_records) == ("Created", 2)
    assert r1.fqtn == "x_excel_tenant1.t_life"
    assert "2 records" in r1.message()

    # same column set, different order → TRUNCATE, data replaced
    df2 = matrix_to_df(spark, [["b", "a"], ["9", "8"]])
    r2 = dest.sync(df2, "t_life", path="tenant1")
    assert (r2.action, r2.n_records) == ("Truncated", 1)

    # changed column set → RECREATE
    df3 = matrix_to_df(spark, [["a", "c"], ["5", "6"]])
    r3 = dest.sync(df3, "t_life", path="tenant1")
    assert (r3.action, r3.n_records) == ("Recreated", 1)
    assert [c.name for c in spark.catalog.listColumns("x_excel_tenant1.t_life")] == ["a", "c"]


def test_cloud_copy_statements(tmp_path):
    rs = CloudCopyDestination(kind="redshift", stage_uri=str(tmp_path))
    stmt = rs.copy_statement("x_excel.t", "s3://bucket/t")
    assert "GZIP" in stmt and "COMPUPDATE OFF" in stmt
    sf = CloudCopyDestination(kind="snowflake", stage_uri=str(tmp_path))
    assert "COPY INTO" in sf.copy_statement("x_excel.t", "%t")


def test_cloud_copy_stages_gzip_csv(spark, tmp_path):
    dest = CloudCopyDestination(kind="redshift", stage_uri=str(tmp_path / "stage"))
    df = matrix_to_df(spark, [["a"], ["1"], ["2"]])
    with pytest.raises(NotImplementedError) as exc:
        dest.sync(df, "t_staged")
    assert "COPY" in str(exc.value)
    staged = list((tmp_path / "stage" / "t_staged").glob("*.csv.gz"))
    assert staged, "expected gzipped CSV parts in the stage dir"


def test_upload_api_end_to_end(spark):
    from excel_to_database_spark.api import upload

    out = upload(
        spark,
        {"data": {"Sheet One": [["a", "b"], ["1", "2"]], "c.csv": "x,y\n3,4"}},
        path="apitest",
    )
    assert "messages" in out and len(out["messages"]) == 2
    assert any("sheet_one" in m for m in out["messages"])
    assert spark.table("x_excel_apitest.c_csv").count() == 1


def test_upload_api_error_shape(spark):
    from excel_to_database_spark.api import upload

    out = upload(spark, {"data": {}})
    assert set(out) == {"error"}


def test_snowflake_stage_and_statement(spark, tmp_path):
    dest = CloudCopyDestination(kind="snowflake", stage_uri=str(tmp_path / "sfstage"))
    df = matrix_to_df(spark, [["a"], ["1"]])
    with pytest.raises(NotImplementedError) as exc:
        dest.sync(df, "t_sf")
    msg = str(exc.value)
    assert "COPY INTO" in msg and "GZIP" in msg
    assert list((tmp_path / "sfstage" / "t_sf").glob("*.csv.gz"))


def test_local_destination_csv_format(spark):
    """The reference's local sink is CSV (data.py:137-153) — the
    fmt='csv' parity mode must survive the full lifecycle."""
    dest = LocalDestination(fmt="csv")
    df = matrix_to_df(spark, [["a", "b"], ["1", "x"], ["2", "y"]])
    r1 = dest.sync(df, "t_csvfmt", path="csvtest")
    assert (r1.action, r1.n_records) == ("Created", 2)
    df2 = matrix_to_df(spark, [["b", "a"], ["z", "9"]])
    r2 = dest.sync(df2, "t_csvfmt", path="csvtest")
    assert r2.action == "Truncated"
    row = spark.table("x_excel_csvtest.t_csvfmt").collect()[0]
    assert (row["a"], row["b"]) == ("9", "z")
