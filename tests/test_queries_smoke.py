"""Smoke: every registered query runs at sf0.001 and returns a stable
schema; the full duckdb differential lives in
scripts/check_correctness.py (driver gate replica)."""

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns == ["l_orderkey", "revenue", "orderdate", "o_orderpriority"]


def test_every_query_runs_at_sf0001(spark, sf_dir):
    qs = entrymod.queries()
    assert len(qs) >= 30
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_oracles_subset_of_queries():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # every oracle-less query is an explicitly non-SQL-expressible op
    assert all(isinstance(v, str) and v.strip() for v in os_.values())


def test_approx_count_distinct_accuracy(spark, sf_dir):
    import pyspark.sql.functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = {
        r["o_orderstatus"]: r["d"]
        for r in o.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["q28_approx_count_distinct"](spark, sf_dir).collect()
    got = {r["o_orderstatus"]: r for r in rows}
    for k, d in exact.items():
        assert got[k]["exact_customers"] == d
        assert got[k]["approx_ok"] == 1  # HLL within 5% of exact
