import pyspark.sql.functions as F

from excel_to_database_spark.sync.bucketing import write_bucketed


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Both sides bucketed on the join key → the join plan contains no
    Exchange (the 100 TB fact-fact join story)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    # force the shuffle-join path (broadcast would hide the bucketing;
    # at real fact-fact scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result is still correct
        assert joined.count() == orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark):
    """Aggregation on the bucket key reuses the bucketing — no shuffle."""
    agg = spark.table("b_lineitem").groupBy("o_orderkey").agg(F.sum("l_quantity"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_partitioned_write_prunes(spark, sf_dir):
    """Partitioned sync → a partition-key predicate scans only the
    matching partition (PartitionFilters, not a full scan)."""
    from excel_to_database_spark.sync.sinks import LocalDestination

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    dest = LocalDestination(partition_by=("order_year",))
    dest.sync(orders, "p_orders", path="parttest")
    q = spark.table("x_excel_parttest.p_orders").filter(F.col("order_year") == 1997)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan, plan[:800]
    n97 = q.count()
    assert n97 == orders.filter(F.col("order_year") == 1997).count()
    assert 0 < n97 < orders.count()


def test_parquet_aggregate_pushdown(spark, sf_dir):
    """Ungrouped min/max/count is answered from parquet footers when
    the DSv2 scan is active — the plan carries PushedAggregation.
    (DSv2 is scoped to this test; the engine keeps the default v1 path
    elsewhere, where aggregatePushdown is simply inert.)"""
    prev = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text")
    try:
        df = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .agg(F.min("l_quantity"), F.max("l_quantity"), F.count(F.lit(1)))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [MIN(l_quantity), MAX(l_quantity), COUNT(*)]" in plan, plan[:800]
        row = df.collect()[0]
        assert row[2] > 0 and row[0] < row[1]
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", prev)
