"""End-to-end lifecycle: the full path a reference user would walk —
upload sheets, query them joined against warehouse tables, export the
result as a workbook, and re-ingest it."""

import pyspark.sql.functions as F
from pyspark.sql.window import Window

from excel_to_database_spark.api import upload
from excel_to_database_spark.sources.excel_source import read_excel
from excel_to_database_spark.sources.xlsx_writer import write_excel


def test_full_lifecycle(spark, sf_dir, tmp_path):
    # 1. upload a two-sheet payload (browser-payload shape)
    out = upload(
        spark,
        {
            "data": {
                "Segment Targets": [
                    ["Segment", "Target"],
                    ["BUILDING", "1000"],
                    ["MACHINERY", "2000"],
                ],
                "notes.csv": "k,v\n1,hello",
            }
        },
        path="e2e",
    )
    assert len(out["messages"]) == 2

    # 2. join the uploaded sheet against the parquet customer table
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet")
    targets = spark.table("x_excel_e2e.segment_targets")
    joined = (
        customers.join(
            F.broadcast(targets), customers.c_mktsegment == targets.Segment
        )
        .groupBy("Segment", "Target")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    rows = {r["Segment"]: r["n_customers"] for r in joined.collect()}
    assert set(rows) == {"BUILDING", "MACHINERY"} and all(v > 0 for v in rows.values())

    # 3. window ranking over the joined result
    w = Window.orderBy(F.desc("n_customers"), F.asc("Segment"))
    ranked = joined.withColumn("rank", F.row_number().over(w))

    # 4. export to xlsx and re-ingest through the independent reader
    p = str(tmp_path / "report.xlsx")
    str_df = ranked.select(*[F.col(c).cast("string").alias(c) for c in ranked.columns])
    n = write_excel(str_df, p, sheet_name="Report")
    back = read_excel(spark, p)
    assert back.count() == n == 2
    assert back.columns == ["Segment", "Target", "n_customers", "rank"]
    assert {r["Segment"] for r in back.collect()} == {"BUILDING", "MACHINERY"}
