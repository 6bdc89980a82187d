"""Relational query inventory: aggregations, joins (all types), window
functions, sorts/limits/top-k, set ops, grouping sets/rollup/cube, and
the scalar-function surface (SURVEY.md §2.3-§2.6 — every row the
reference lacks, expressed as pure Catalyst plans).

Scale notes, verified via .explain on sf0.1 (see bench.py):
  * dimension joins (region/nation/customer/supplier/part) broadcast —
    they stay tiny relative to fact tables at any SF;
  * fact-fact joins shuffle on their keys with AQE handling skew;
  * every aggregate is partial+final (map-side combine) by construction;
  * filters sit directly on parquet scans (PushedFilters) because the
    plans are declarative end-to-end — no UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from excel_to_database_spark.queries.base import (
    davg,
    dsum,
    query,
    register_views,
    sql_davg,
    sql_dsum,
    t,
)

# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (hash agg, partial+final)."""
    l = t(spark, sf_dir, "lineitem")
    price, disc, tax = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(price * (1 - disc), "sum_disc_price"),
            dsum(price * (1 - disc) * (1 + tax), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_distinct_counts",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(DISTINCT c_custkey) AS n_customers,
           COUNT(*) AS n_rows
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q02_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q03_rollup_region_nation",
    f"""
    SELECT r_name, n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal', 'sum_acctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q03_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over a two-level dimension hierarchy; both dim joins
    broadcast (nation=25, region=5 rows at every SF)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dsum("c_acctbal", "sum_acctbal"),
    )


@query(
    "q04_cube_orders",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q04_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "sum_price"))
    )


@query(
    "q05_grouping_sets",
    f"""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal', 'sum_acctbal')}
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    """,
)
def q05_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey,
               COUNT(*) AS n_customers,
               {sql_dsum('c_acctbal', 'sum_acctbal')}
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------


@query(
    "q10_shipping_priority",
    f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def q10_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter → broadcast; fact join
    shuffles on orderkey; top-k with unique tiebreaker."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q11_local_supplier_volume",
    f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q11_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style five-way join; every dimension broadcast, single
    shuffle on the orders⋈lineitem key."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "q12_semi_join_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_returnflag = 'R'
          AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def q12_semi_join_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join (EXISTS) with an extra non-equi conjunct."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "q13_anti_join_idle_customers",
    """
    SELECT c_mktsegment, COUNT(*) AS n_idle
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q13_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_idle"))
    )


@query(
    "q14_outer_join_order_counts",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q14_outer_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT(col)
    skips the nulls they produce)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "q15_theta_join_premium_lineitems",
    f"""
    SELECT p_brand,
           COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice', 'sum_price')}
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND l_extendedprice > 20 * p_retailprice
    GROUP BY p_brand
    """,
)
def q15_theta_join_premium_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + theta residual: hash join on partkey, predicate as a
    post-join filter Catalyst keeps inside the join."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        l.join(
            F.broadcast(p),
            (l.l_partkey == p.p_partkey)
            & (l.l_extendedprice > 20 * p.p_retailprice),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


@query(
    "q16_cross_join_matrix",
    """
    SELECT r_name, s.o_orderstatus, COUNT(*) AS n
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    GROUP BY r_name, s.o_orderstatus
    """,
)
def q16_cross_join_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = t(spark, sf_dir, "region")
    s = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(s).groupBy("r_name", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q17_returned_items_topk",
    f"""
    SELECT c_custkey, c_name, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q17_returned_items_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item ranking."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Filters / sorts / limits
# --------------------------------------------------------------------------


@query(
    "q20_revenue_band_filter",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q20_revenue_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: every predicate reaches the parquet scan
    (PushedFilters) — verified in bench plan review."""
    l = t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q21_topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def q21_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — no full sort,
    per-partition heaps + driver merge of k rows."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------


@query(
    "q30_running_customer_total",
    """
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def q30_running_customer_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "q31_rank_lag_lead",
    """
    SELECT c_custkey, c_mktsegment,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           LAG(c_acctbal) OVER w AS prev_bal,
           LEAD(c_acctbal) OVER w AS next_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q31_rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("c_acctbal").over(w).alias("prev_bal"),
        F.lead("c_acctbal").over(w).alias("next_bal"),
    )


@query(
    "q32_topk_per_group",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    ) WHERE rn <= 3
    """,
)
def q32_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per segment — rank-only, so it routes through
    selection.group_rank (round-14 verdict #5): ~5 market segments is
    exactly the low-cardinality shape where
    ``Window.partitionBy(c_mktsegment)`` funnels each segment's whole
    customer set into one task (~20% of the table per task at 100 TB).
    group_rank's (value DESC, id) order matches the oracle's ORDER BY
    c_acctbal DESC, c_custkey tie-break; see PLANS.md for why q31
    (lag/lead/ntile over the same segments) deliberately stays on the
    built-in window surface."""
    from excel_to_database_spark.operators.selection import group_rank

    ranked = group_rank(
        t(spark, sf_dir, "customer").select(
            "c_mktsegment", "c_acctbal", "c_custkey"
        ),
        "c_mktsegment",
        "c_acctbal",
        "c_custkey",
        out_col="rn",
        value_desc=True,
    )
    return ranked.filter(F.col("rn") <= 3).select(
        "c_mktsegment", "c_custkey", "c_acctbal"
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------


@query(
    "q40_set_intersect",
    """
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey FROM orders
    """,
)
def q40_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@query(
    "q41_set_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
    """,
)
def q41_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)  # EXCEPT DISTINCT, matching the SQL oracle


@query(
    "q42_union_all_counts",
    """
    SELECT side, COUNT(*) AS n FROM (
        SELECT 'customer' AS side, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supplier' AS side, s_nationkey AS nationkey FROM supplier
    ) GROUP BY side
    """,
)
def q42_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("nationkey")
    )
    s = t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("side"), F.col("s_nationkey").alias("nationkey")
    )
    return c.unionByName(s).groupBy("side").agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Scalar function surface
# --------------------------------------------------------------------------


@query(
    "q50_string_functions",
    """
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_name) AS name_lower,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           LENGTH(p_name) AS name_len,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           CONCAT_WS('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           TRIM(p_name) AS name_trim,
           REPLACE(p_type, ' ', '_') AS type_snake,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(LOWER(p_name), '[^a-z0-9]+', '_', 'g') AS name_sqlified,
           REGEXP_REPLACE(p_name, '[^A-Za-z0-9_]', '', 'g') AS name_alnum
    FROM part
    """,
)
def q50_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery; the last two projections are the
    reference's to_alnum/sqlify identifier rules (app/data.py:24-27,
    :84-85) as data-plane expressions."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_name").alias("name_lower"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_snake"),
        F.regexp_extract(F.col("p_brand"), "([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace(F.lower("p_name"), "[^a-z0-9]+", "_").alias("name_sqlified"),
        F.regexp_replace(F.col("p_name"), "[^A-Za-z0-9_]", "").alias("name_alnum"),
    )


@query(
    "q51_date_functions",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           COUNT(*) AS n_lineitems,
           CAST(SUM(DATEDIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS BIGINT)
               AS total_delay_days,
           CAST(SUM(DATEDIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))) AS DOUBLE)
               / COUNT(*) AS avg_delay_days,
           STRFTIME(MIN(DATE_TRUNC('month', o_orderdate)), '%Y-%m-%d') AS first_month
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY order_year, order_month
    """,
)
def q51_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    delay = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum(delay).alias("total_delay_days"),
            (F.sum(delay).cast("double") / F.count(F.lit(1))).alias("avg_delay_days"),
            F.date_format(F.min(F.date_trunc("month", F.col("o_orderdate"))), "yyyy-MM-dd").alias(
                "first_month"
            ),
        )
    )


@query(
    "q52_math_functions",
    f"""
    SELECT l_linenumber,
           COUNT(*) AS n,
           {sql_dsum('ROUND(CAST(l_extendedprice AS DECIMAL(20,2)), 1)', 'sum_rounded')},
           {sql_dsum('ABS(l_discount - 0.05)', 'sum_abs_disc')},
           {sql_dsum('SQRT(l_quantity)', 'sum_sqrt_qty')},
           CAST(SUM(CAST(FLOOR(l_quantity / 7) AS BIGINT)) AS BIGINT) AS sum_floor,
           CAST(SUM(CAST(CEIL(l_quantity / 7) AS BIGINT)) AS BIGINT) AS sum_ceil,
           CAST(SUM(l_orderkey % 97) AS BIGINT) AS sum_mod
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def q52_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = t(spark, sf_dir, "lineitem")
    qty, price, disc = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return l.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        # ROUND on decimal, not double: both engines round decimals
        # ties-away-from-zero, while double rounding differs (Spark
        # rounds the shortest decimal repr, DuckDB the exact binary)
        dsum(F.round(price.cast("decimal(20,2)"), 1), "sum_rounded"),
        dsum(F.abs(disc - 0.05), "sum_abs_disc"),
        dsum(F.sqrt(qty), "sum_sqrt_qty"),
        F.sum(F.floor(qty / 7).cast("bigint")).alias("sum_floor"),
        F.sum(F.ceil(qty / 7).cast("bigint")).alias("sum_ceil"),
        F.sum(F.col("l_orderkey") % 97).alias("sum_mod"),
    )


@query(
    "q53_case_and_conditionals",
    f"""
    SELECT CASE WHEN o_totalprice >= 300000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_label,
           COUNT(*) AS n,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY price_band, status_label
    """,
)
def q53_case_and_conditionals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
        .alias("price_band")
    )
    status = F.coalesce(
        F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
    ).alias("status_label")
    return o.groupBy(band, status).agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice", "sum_price")
    )


@query(
    "q54_json_extraction",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q54_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal props column: JSON payload → typed values
    (SURVEY.md §2.9 'multimodal columns' row, from_json/get_json_object)."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "q55_array_functions",
    """
    SELECT vec_id,
           LEN(embedding) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_component,
           CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12)))
                AS DOUBLE) AS sq_norm
    FROM (SELECT vec_id, embedding, UNNEST(embedding) AS x FROM embeddings)
    GROUP BY vec_id, dim, first_component
    """,
)
def q55_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array column surface: size, element access, element-wise reduce
    (the exact-norm building block for similarity search). Exploded with
    decimal summation for cross-engine exactness; the operators module
    uses the single-pass F.aggregate form."""
    e = t(spark, sf_dir, "embeddings")
    x = F.col("x").cast("double")
    return (
        e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_component"),
            F.explode("embedding").alias("x"),
        )
        .groupBy("vec_id", "dim", "first_component")
        # scale 12, not finer: past ~17 significant digits Spark's
        # double→decimal cast (via shortest repr) and DuckDB's (exact
        # binary) disagree; 1e-12 grid is safely inside both
        .agg(F.sum((x * x).cast("decimal(30,12)")).cast("double").alias("sq_norm"))
    )


# --------------------------------------------------------------------------
# Statistical aggregates, subqueries, pivot (coverage extension)
# --------------------------------------------------------------------------


@query(
    "q06_percentiles",
    """
    SELECT l_returnflag,
           QUANTILE_CONT(l_quantity, 0.25) AS p25,
           QUANTILE_CONT(l_quantity, 0.5) AS p50,
           QUANTILE_CONT(l_quantity, 0.75) AS p75,
           QUANTILE_CONT(l_quantity, 0.95) AS p95
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q06_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles. Safe cross-engine because
    l_quantity is integral-valued doubles: interpolation lands on .0/.25
    /.5/.75 exactly in both engines."""
    l = t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
        F.percentile("l_quantity", 0.95).alias("p95"),
    )


@query(
    "q07_stats_moments",
    """
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s2,
           SQRT((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q07_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance/stddev via the closed two-pass-free moment formula on
    decimal-routed sums — Spark's stddev_samp (Welford) and DuckDB's
    are not bit-comparable, so the engine exposes moments explicitly
    when exact reproducibility is required."""
    l = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    s1 = F.sum(qty.cast("decimal(30,6)")).cast("double")
    s2 = F.sum((qty * qty).cast("decimal(30,6)")).cast("double")
    n = F.count(F.lit(1))
    return l.groupBy("l_linestatus").agg(
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
        F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1))).alias("stddev_qty"),
    )


@query(
    "q08_pivot_status_priority",
    """
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q08_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide counts per status). Spark's pivot() with explicit
    value list — Catalyst turns it into the same CASE aggregation the
    oracle states."""
    o = t(spark, sf_dir, "orders")
    out = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("F"),
        F.coalesce(F.col("O"), F.lit(0)).alias("O"),
        F.coalesce(F.col("P"), F.lit(0)).alias("P"),
    )


@query(
    "q18_having_big_customers",
    """
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS total_spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 15
       AND CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) >= 1000000
    """,
)
def q18_having_big_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )
        .filter((F.col("n_orders") >= 15) & (F.col("total_spend") >= 1000000))
    )


@query(
    "q19_correlated_scalar_subquery",
    """
    SELECT p_partkey, p_brand, p_retailprice
    FROM part p
    WHERE p_retailprice > 1.05 * (
        SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
        FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    """,
)
def q19_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it into an
    aggregate + join); the inner average is decimal-routed on both
    sides so the comparison boundary is identical."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, p_retailprice
        FROM part p
        WHERE p_retailprice > 1.05 * (
            SELECT CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
            FROM part p2 WHERE p2.p_brand = p.p_brand
        )
        """
    )


@query(
    "q22_in_subquery",
    """
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
    GROUP BY o_orderstatus
    """,
)
def q22_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderstatus
        """
    )


@query(
    "q23_cte_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                    AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q23_cte_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: CTE + uncorrelated scalar subquery (max)."""
    register_views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                        AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )


@query(
    "q24_argmax_and_arrayagg",
    """
    SELECT c_mktsegment,
           MAX_BY(c_name, c_custkey) AS latest_customer,
           ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT c_nationkey)), ',') AS nation_keys
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def q24_argmax_and_arrayagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a unique ordering key (deterministic) + sorted
    distinct array aggregation rendered to a string (engine-portable
    representation of a collected list)."""
    c = t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.max_by("c_name", "c_custkey").alias("latest_customer"),
        F.array_join(
            F.array_sort(F.collect_set("c_nationkey")).cast("array<string>"), ","
        ).alias("nation_keys"),
    )


@query(
    "q25_market_share",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(SUM(CAST(CASE WHEN n_name = 'GERMANY'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                  AS DOUBLE) AS mkt_share
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    GROUP BY order_year
    """,
)
def q25_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: ratio of conditional revenue to total revenue
    per year — a ratio of two decimal-routed sums, so the division is
    over bit-identical doubles in both engines."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    german = F.when(F.col("n_name") == "GERMANY", rev).otherwise(F.lit(0))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("order_year"))
        .agg(
            (
                F.sum(german.cast("decimal(30,6)")).cast("double")
                / F.sum(rev.cast("decimal(30,6)")).cast("double")
            ).alias("mkt_share")
        )
    )


@query(
    "q26_promo_revenue_ratio",
    """
    SELECT 100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                      THEN l_extendedprice * (1 - l_discount)
                                      ELSE 0 END AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                  AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q26_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate percentage."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return l.join(F.broadcast(p), l.l_partkey == p.p_partkey).agg(
        (
            F.lit(100.0)
            * F.sum(promo.cast("decimal(30,6)")).cast("double")
            / F.sum(rev.cast("decimal(30,6)")).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q27_large_quantity_orders",
    """
    SELECT c_custkey, o_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_qty,
           o_totalprice
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) > 350
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    """,
)
def q27_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate → semi-join back to the fact table.
    The inner HAVING set is computed once and semi-joined (Catalyst
    plans a left-semi hash join, no correlated re-scan)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("q"))
        .filter(F.col("q") > 350)
        .select("l_orderkey")
    )
    return (
        l.join(big.withColumnRenamed("l_orderkey", "big_key"),
               F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double").alias("total_qty"))
        .select("c_custkey", "o_orderkey", "total_qty", "o_totalprice")
    )


@query(
    "q28_approx_count_distinct",
    """
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(1 AS INT) AS approx_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def q28_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the constant-memory
    distinct-count for 100 TB cardinality estimation. DuckDB's HLL is a
    different sketch, so the raw estimate can't be hash-compared;
    instead the query emits the exact count plus ``approx_ok`` — 1 iff
    Spark's rsd=0.02 estimate lands within 5% of exact — and the oracle
    states the deterministic expectation (exact counts, approx_ok=1)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("_approx"),
        )
        .select(
            "o_orderstatus",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("_approx") - F.col("exact_customers"))
                <= 0.05 * F.col("exact_customers")
            )
            .cast("int")
            .alias("approx_ok"),
        )
    )


@query(
    "q29_unpivot",
    """
    SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value
    FROM orders WHERE o_orderkey <= 500
    UNION ALL
    SELECT o_orderkey, 'o_custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
    FROM orders WHERE o_orderkey <= 500
    """,
)
def q29_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long melt); the oracle states the equivalent
    stacked UNION ALL."""
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.col("o_totalprice"),
            F.col("o_custkey").cast("double").alias("o_custkey"),
        )
    )
    return o.unpivot("o_orderkey", ["o_totalprice", "o_custkey"], "metric", "value")


@query(
    "q33_disjunctive_predicates",
    f"""
    SELECT COUNT(*) AS n_items,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)
    """,
)
def q33_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR of conjunctive clauses across both join
    sides — exercises predicate normalization (Catalyst extracts the
    common join key and pushes the per-side residuals)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#1") & qty.between(1, 11) & (size <= 5))
        | ((brand == "Brand#2") & qty.between(10, 20) & (size <= 10))
        | ((brand == "Brand#3") & qty.between(20, 30) & (size <= 15))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@query(
    "q34_count_histogram",
    """
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY n_orders
    """,
)
def q34_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate of an aggregate (orders-per-customer
    distribution), with the outer-join null → zero bucket."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "q35_rich_idle_customers",
    """
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
            FROM customer c2 WHERE c2.c_acctbal > 0
          )
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
)
def q35_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: uncorrelated scalar subquery (decimal-routed
    average) combined with a conditional anti join (no large orders),
    then aggregated."""
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE) AS total_bal
        FROM customer c
        WHERE c_acctbal > (
                SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*)
                FROM customer c2 WHERE c2.c_acctbal > 0
              )
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
        """
    )


@query(
    "q36_levenshtein",
    """
    SELECT p_brand,
           COUNT(*) AS n,
           CAST(SUM(levenshtein(p_name, p_type)) AS BIGINT) AS total_edit_distance,
           MIN(levenshtein(p_name, p_type)) AS min_edit_distance
    FROM part
    GROUP BY p_brand
    """,
)
def q36_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar (deterministic integer metric both engines)."""
    p = t(spark, sf_dir, "part")
    lev = F.levenshtein("p_name", "p_type")
    return p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(lev).alias("total_edit_distance"),
        F.min(lev).alias("min_edit_distance"),
    )


@query(
    "q37_date_parts",
    """
    SELECT CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
           CAST(ISODOW(o_orderdate) AS BIGINT) AS iso_dow,
           STRFTIME(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           STRFTIME(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
           COUNT(*) AS n
    FROM orders
    GROUP BY qtr, iso_dow, month_end, plus3m
    """,
)
def q37_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar functions: quarter, ISO day-of-week (Spark's dayofweek
    is Sunday=1 — remapped to ISO Monday=1 to match DuckDB), last_day,
    add_months."""
    o = t(spark, sf_dir, "orders")
    iso_dow = ((F.dayofweek("o_orderdate") + 5) % 7 + 1).cast("bigint")
    return o.groupBy(
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        iso_dow.alias("iso_dow"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(F.col("o_orderdate").cast("date"), 3), "yyyy-MM-dd").alias("plus3m"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q38_relational_division",
    """
    SELECT o_custkey AS custkey
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) =
           (SELECT COUNT(DISTINCT EXTRACT(YEAR FROM o_orderdate)) FROM orders)
    """,
)
def q38_relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational division ('for all'): customers who ordered in EVERY
    year present in the data — distinct-count equality against the
    universe, the shuffle-friendly form of the double-NOT-EXISTS."""
    o = t(spark, sf_dir, "orders")
    universe = o.agg(
        F.countDistinct(F.year("o_orderdate")).alias("__n_years")
    )
    return (
        o.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.countDistinct(F.year("o_orderdate")).alias("ny"))
        # one-row universe frame joined in (broadcast nested loop) —
        # keeps plan construction job-free instead of a driver count()
        .crossJoin(F.broadcast(universe))
        .filter(F.col("ny") == F.col("__n_years"))
        .select("custkey")
    )


@query(
    "q39_self_join_pairs",
    """
    SELECT a.n_name AS nation_a, b.n_name AS nation_b, r_name
    FROM nation a
    JOIN nation b ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    JOIN region ON a.n_regionkey = r_regionkey
    """,
)
def q39_self_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-temporal self-join: unordered same-region nation pairs."""
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    a = n.select(F.col("n_name").alias("nation_a"), F.col("n_regionkey").alias("rk_a"), F.col("n_nationkey").alias("ka"))
    b = n.select(F.col("n_name").alias("nation_b"), F.col("n_regionkey").alias("rk_b"), F.col("n_nationkey").alias("kb"))
    return (
        a.join(b, (F.col("rk_a") == F.col("rk_b")) & (F.col("ka") < F.col("kb")))
        .join(F.broadcast(r), F.col("rk_a") == r.r_regionkey)
        .select("nation_a", "nation_b", "r_name")
    )


@query(
    "q59_string_extras",
    """
    SELECT p_partkey,
           REVERSE(p_brand) AS brand_rev,
           REPEAT(p_brand, 2) AS brand_twice,
           TRANSLATE(p_type, 'AEIOU', 'aeiou') AS type_translated,
           LEFT(p_name, 4) AS name_left4,
           RIGHT(p_name, 4) AS name_right4,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           CAST(STRPOS(p_type, 'A') AS INTEGER) AS first_a,
           STARTS_WITH(p_brand, 'Brand') AS is_brand,
           CAST(p_name LIKE '%e%' AS BOOLEAN) AS has_e
    FROM part
    """,
)
def q59_string_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: reverse/repeat/translate/left/right/
    lpad/strpos/starts_with/LIKE."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.translate("p_type", "AEIOU", "aeiou").alias("type_translated"),
        F.substring("p_name", 1, 4).alias("name_left4"),
        F.substring(F.col("p_name"), -4, 4).alias("name_right4"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.instr("p_type", "A").cast("int").alias("first_a"),
        F.startswith(F.col("p_brand"), F.lit("Brand")).alias("is_brand"),
        F.col("p_name").like("%e%").alias("has_e"),
    )


@query(
    "q43_weighted_avg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
           / CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
               AS qty_weighted_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q43_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mean as a ratio of decimal-routed sums."""
    l = t(spark, sf_dir, "lineitem")
    num = F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast("decimal(30,6)")).cast("double")
    den = F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
    return l.groupBy("l_returnflag").agg((num / den).alias("qty_weighted_price"))


@query(
    "q44_rank_distributions",
    """
    SELECT c_custkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(c_custkey) OVER w AS seg_richest,
           NTH_VALUE(c_custkey, 2) OVER w AS seg_second
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q44_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank, cume_dist,
    first_value, nth_value (running frame, unique total order)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("c_custkey").over(wf).alias("seg_richest"),
        F.nth_value("c_custkey", 2).over(wf).alias("seg_second"),
    )


@query(
    "q45_bool_aggregates",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_totalprice > 200000) AS n_big,
           BOOL_AND(o_totalprice > 1000) AS all_over_1k,
           BOOL_OR(o_orderstatus = 'P') AS any_pending
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q45_bool_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregates: count_if, bool_and, bool_or."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
    )


@query(
    "q46_regex_filter",
    """
    SELECT p_brand, COUNT(*) AS n_matching
    FROM part
    WHERE regexp_matches(p_name, '^[a-m].*o.*o')
    GROUP BY p_brand
    """,
)
def q46_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RLIKE predicate filter (regex pushed as a data filter)."""
    p = t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").rlike("^[a-m].*o.*o"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_matching"))
    )


@query(
    "q47_null_ordering",
    """
    SELECT c_custkey, prev_bal FROM (
        SELECT c_custkey,
               LAG(c_acctbal) OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal, c_custkey) AS prev_bal
        FROM customer
    )
    ORDER BY prev_bal ASC NULLS FIRST, c_custkey
    LIMIT 50
    """,
)
def q47_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit NULLS FIRST global sort — Spark's ASC default is
    nulls-first but DuckDB's is nulls-last, so portable plans must
    state it."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", F.lag("c_acctbal").over(w).alias("prev_bal"))
        .orderBy(F.asc_nulls_first("prev_bal"), F.asc("c_custkey"))
        .limit(50)
    )


@query(
    "q48_filtered_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q48_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan-only filter aggregate. All four predicates
    reach the parquet scan as PushedFilters; no shuffle at all beyond
    the single-row final agg."""
    l = t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q49_nation_pair_volume",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(YEAR FROM l_shipdate) AS ship_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'volume')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
    """,
)
def q49_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year.
    One fact-fact shuffle join (lineitem ⋈ orders); supplier, customer
    and both nation aliases broadcast. The nation-name filters push
    through the broadcast joins so most rows die before the shuffle."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = ["NATION_1", "NATION_2"]
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            F.col("supp_nation").isin(pair)
            & F.col("cust_nation").isin(pair)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


@query(
    "q09_product_profit",
    f"""
    SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS order_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'profit')},
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: testdata has no partsupp, so profit is
    discounted revenue): per-nation, per-year profit on parts matching
    a name pattern. The p_name LIKE filter prunes part BEFORE its
    broadcast, so the lineitem⋈part broadcast join is also a
    semi-filter; only lineitem⋈orders shuffles."""
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "profit"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q56_map_functions",
    """
    SELECT k, v, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, 'lang' AS k, lang AS v FROM documents
        UNION ALL
        SELECT doc_id, 'source' AS k, source AS v FROM documents
    )
    GROUP BY k, v
    """,
)
def q56_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (SURVEY.md §2.6 map surface): parse a
    'k:v,k:v' string into a map with str_to_map, then explode it to
    rows — the LATERAL VIEW / UDTF shape. The oracle is the relational
    unrolling of the same map. Narrow ops only; single shuffle for the
    final agg."""
    d = t(spark, sf_dir, "documents")
    m = F.str_to_map(
        F.concat_ws(",", F.concat_ws(":", F.lit("lang"), F.col("lang")),
                    F.concat_ws(":", F.lit("source"), F.col("source"))),
        F.lit(","), F.lit(":"),
    )
    return (
        d.select("doc_id", F.explode(m).alias("k", "v"))
        .groupBy("k", "v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "q57_explode_sequence",
    """
    SELECT CAST(m AS BIGINT) AS m, COUNT(*) AS n,
           CAST(SUM(o_totalprice_i) AS BIGINT) AS sum_price_i
    FROM (
        SELECT UNNEST(generate_series(1, CAST(o_orderkey % 4 + 1 AS BIGINT))) AS m,
               CAST(FLOOR(o_totalprice) AS BIGINT) AS o_totalprice_i
        FROM orders
    )
    GROUP BY m
    """,
)
def q57_explode_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator expression (explode over sequence) — the row-producing
    UDTF shape done JVM-side: each order fans out into 1-4 rows with no
    Python in the loop. Integer-floored price keeps the sum
    engine-exact without the decimal route."""
    o = t(spark, sf_dir, "orders")
    n = (F.col("o_orderkey") % 4 + 1).cast("int")
    return (
        o.select(
            F.explode(F.sequence(F.lit(1), n)).alias("m"),
            F.floor("o_totalprice").cast("bigint").alias("o_totalprice_i"),
        )
        .groupBy(F.col("m").cast("bigint").alias("m"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("o_totalprice_i").alias("sum_price_i"),
        )
    )


@query(
    "q58_multiset_ops",
    """
    SELECT op, nationkey, COUNT(*) AS n FROM (
        SELECT 'intersect_all' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            INTERSECT ALL
            SELECT s_nationkey FROM supplier
        )
        UNION ALL
        SELECT 'except_all' AS op, nationkey FROM (
            SELECT c_nationkey AS nationkey FROM customer
            EXCEPT ALL
            SELECT s_nationkey FROM supplier
        )
    )
    GROUP BY op, nationkey
    """,
)
def q58_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set-ops (INTERSECT ALL / EXCEPT ALL) — bag semantics
    with duplicate preservation, distinct from q40/q41's set variants."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = c.intersectAll(s).select(F.lit("intersect_all").alias("op"), "nationkey")
    exc = c.exceptAll(s).select(F.lit("except_all").alias("op"), "nationkey")
    return inter.unionAll(exc).groupBy("op", "nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "q90_bivariate_stats",
    """
    SELECT l_returnflag,
           n,
           ((CAST(num AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
               / 100.0 AS covar_pop_qty_price,
           CAST(num AS DOUBLE)
               / SQRT(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE))
               AS corr_qty_price
    FROM (
        SELECT l_returnflag, n,
               CAST(n AS HUGEINT) * sxy - sx * sy AS num,
               CAST(n AS HUGEINT) * sxx - sx * sx AS denx,
               CAST(n AS HUGEINT) * syy - sy * sy AS deny
        FROM (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(CAST(l_quantity AS BIGINT)) AS sx,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sy,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS sxy,
                   SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sxx,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS syy
            FROM lineitem
            GROUP BY l_returnflag
        )
    )
    """,
)
def q90_bivariate_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate aggregates (population covariance + Pearson
    correlation). Native corr()/covar_pop() are running-moment
    implementations whose float accumulation is order-dependent — and
    even decimal-routed sums of price² break down because at ~1e10
    magnitude a double's ulp reaches the decimal(30,6) quantum, where
    Spark's shortest-repr double→decimal cast and DuckDB's exact-value
    cast can round apart. Instead: quantity is integral and price has
    exactly 2 decimals in this data, so all five co-moments are exact
    integer sums (price in cents), combined via DECIMAL(38,0) here and
    HUGEINT in the oracle, with ONE int→double conversion at the end.
    covar is rescaled cents→currency (÷100); corr is scale-invariant.
    Same one-shuffle partial+final agg shape as a plain sum."""
    l = t(spark, sf_dir, "lineitem")
    xi = F.col("l_quantity").cast("bigint")
    yi = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    base = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi).alias("sx"),
        F.sum(yi).alias("sy"),
        F.sum(xi * yi).alias("sxy"),
        F.sum(xi * xi).alias("sxx"),
        F.sum((yi * yi).cast("decimal(38,0)")).alias("syy"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")
    n = d38("n")
    num = (n * d38("sxy") - d38("sx") * d38("sy")).cast("double")
    denx = (n * d38("sxx") - d38("sx") * d38("sx")).cast("double")
    deny = (n * F.col("syy") - d38("sy") * d38("sy")).cast("double")
    nd = F.col("n").cast("double")
    return base.select(
        "l_returnflag",
        "n",
        (num / nd / nd / 100.0).alias("covar_pop_qty_price"),
        (num / F.sqrt(denx * deny)).alias("corr_qty_price"),
    )


@query(
    "q91_filtered_aggregates",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           {sql_dsum('o_totalprice', 'sum_all')},
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS sum_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q91_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation — one pass computing
    unconditional and predicated aggregates side by side (the SQL-
    standard form of the CASE-WHEN-inside-SUM idiom)."""
    o = t(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(fin, 1)).alias("n_finished"),
        dsum("o_totalprice", "sum_all"),
        F.sum(F.when(fin, F.col("o_totalprice")).cast("decimal(30,6)"))
        .cast("double")
        .alias("sum_finished"),
    )


@query(
    "q92_grouping_flags",
    """
    SELECT r_name, n_name,
           CAST(GROUPING(r_name) AS BIGINT) AS g_region,
           CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
           CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q92_grouping_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING()/GROUPING_ID() over a rollup — the flags that let
    consumers tell a rollup subtotal's NULL apart from a NULL in the
    data. grouping_id is rebuilt from the two flags so both engines
    agree on bit order."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    g = lambda col: F.grouping(col).cast("bigint")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            g("r_name").alias("g_region"),
            g("n_name").alias("g_nation"),
            (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "q101_approx_quantiles",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           QUANTILE_CONT(l_quantity, 0.5) AS exact_p50,
           QUANTILE_CONT(l_quantity, 0.95) AS exact_p95,
           CAST(1 AS INT) AS approx_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q101_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (Greenwald-Khanna sketch) — the bounded-memory
    quantile for 100 TB distributions, where exact percentile's global
    sort-by-key is the scale bottleneck. Like q28's HLL contract: the
    query emits the exact interpolated percentiles (cross-engine-safe
    on integral-valued l_quantity, as q06 establishes) plus
    ``approx_ok`` — 1 iff the sketch at accuracy 10000 lands within 1%
    of exact — and the oracle states the deterministic expectation."""
    l = t(spark, sf_dir, "lineitem")
    g = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_quantity", 0.5).alias("exact_p50"),
        F.percentile("l_quantity", 0.95).alias("exact_p95"),
        F.percentile_approx("l_quantity", [0.5, 0.95], 10000).alias("_ap"),
    )
    ok = (
        (F.abs(F.element_at("_ap", 1) - F.col("exact_p50")) <= 0.01 * F.col("exact_p50"))
        & (F.abs(F.element_at("_ap", 2) - F.col("exact_p95")) <= 0.01 * F.col("exact_p95"))
    )
    return g.select(
        "l_returnflag", "n", "exact_p50", "exact_p95", ok.cast("int").alias("approx_ok")
    )


def _sql_zorder(nx: str, ny: str, bits: int) -> str:
    """DuckDB twin of layout.zorder_value for two pre-normalized
    columns: bit i of x lands at 2i, bit i of y at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({nx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ny} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "q106_zorder_histogram",
    f"""
    WITH norm AS (
        SELECT CAST(FLOOR(CAST(l_partkey AS DOUBLE) * (255.0 / 1999.0)) AS BIGINT) AS nx,
               CAST(FLOOR(CAST(l_suppkey AS DOUBLE) * (255.0 / 99.0)) AS BIGINT) AS ny
        FROM lineitem
    ),
    z AS (SELECT {_sql_zorder('nx', 'ny', 8)} AS zval FROM norm)
    SELECT CAST(zval >> 8 AS BIGINT) AS z_cell,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM z GROUP BY z_cell
    """,
)
def q106_zorder_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order layout math as a first-class query: Morton-interleave
    (l_partkey, l_suppkey) at 8 bits per dimension with the table's
    fixed [0,1999]x[0,99] bounds, then histogram the 256 coarse curve
    cells — the same cell occupancy that drives zorder_write's file
    balance. Bit arithmetic is identical JVM/DuckDB, so the histogram
    is exact, registering the layout operator in the driver gate."""
    from excel_to_database_spark.sync.layout import _normalize, zorder_value

    l = t(spark, sf_dir, "lineitem")
    nx = _normalize(F.col("l_partkey"), 0, 1999, 8)
    ny = _normalize(F.col("l_suppkey"), 0, 99, 8)
    z = zorder_value([nx, ny], bits=8)
    return (
        l.select(F.shiftright(z, 8).cast("bigint").alias("z_cell"))
        .groupBy("z_cell")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "q107_frame_functions",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_price,
           NTH_VALUE(o_totalprice, 2)
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS trailing3_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q107_frame_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window FRAMES: first/last/nth value over an unbounded
    ROWS frame and a trailing-3 moving sum (decimal-routed, so the
    frame sum is order-exact cross-engine). Each customer's order
    history is one partition — the frame never spans partitions, so
    the plan is one shuffle on o_custkey."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_trail = w.rowsBetween(-2, Window.currentRow)
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).alias("second_price"),
        F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
        .over(w_trail)
        .cast("double")
        .alias("trailing3_sum"),
    )


@query(
    "q110_count_min_sketch",
    """
    WITH seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    exploded AS (
        SELECT seed,
               CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 256 AS bucket
        FROM lineitem, seeds
    ),
    sketch AS (SELECT seed, bucket, COUNT(*) AS cnt FROM exploded GROUP BY seed, bucket),
    probes AS (SELECT DISTINCT l_partkey AS item FROM lineitem WHERE l_partkey < 50),
    probe_buckets AS (
        SELECT item, seed,
               CAST(('0x' || substring(md5(CAST(item AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 256 AS bucket
        FROM probes, seeds
    ),
    est AS (SELECT item, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_est
            FROM probe_buckets LEFT JOIN sketch USING (seed, bucket)
            GROUP BY item),
    exact AS (SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM lineitem WHERE l_partkey < 50 GROUP BY item)
    SELECT item, exact_cnt, cms_est,
           CAST(cms_est >= exact_cnt AS INT) AS never_undercounts
    FROM exact JOIN est USING (item)
    """,
)
def q110_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (depth 4 × width 256) over l_partkey frequency,
    probed for the keys < 50 against their exact counts. The md5 hash
    family makes every counter engine-portable, so the ORACLE rebuilds
    the identical sketch and the match is exact — including the
    per-row ``never_undercounts`` invariant (collisions only inflate).
    The sketch is O(depth*width) rows regardless of corpus size: the
    constant-memory frequency answer at 100 TB."""
    from excel_to_database_spark.operators.sketch import cms_build, cms_estimate

    l = t(spark, sf_dir, "lineitem")
    sketch = cms_build(l, "l_partkey", depth=4, width=256)
    probes = l.filter(F.col("l_partkey") < 50)
    est = cms_estimate(sketch, probes, "l_partkey", depth=4, width=256)
    exact = (
        probes.groupBy(F.col("l_partkey").alias("item"))
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return exact.join(est, "item").select(
        "item",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") >= F.col("exact_cnt")).cast("int").alias("never_undercounts"),
    )


@query(
    "q111_bloom_membership",
    """
    WITH seeds AS (SELECT UNNEST([0, 1, 2]) AS seed),
    bits AS (
        SELECT DISTINCT seed,
               CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 4096 AS bit
        FROM orders, seeds
    ),
    probe_bits AS (
        SELECT c_custkey AS item, seed,
               CAST(('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 4096 AS bit
        FROM customer, seeds
    ),
    hits AS (SELECT item, COUNT(*) = SUM(CASE WHEN bits.bit IS NOT NULL THEN 1 ELSE 0 END) AS bloom_hit
             FROM probe_bits LEFT JOIN bits USING (seed, bit)
             GROUP BY item),
    members AS (SELECT DISTINCT o_custkey AS item FROM orders)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probed,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN members.item IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
           CAST(SUM(CASE WHEN bloom_hit AND members.item IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN NOT bloom_hit AND members.item IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negatives
    FROM hits LEFT JOIN members USING (item)
    """,
)
def q111_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership (3 hashes × 4096 bits) of the ordering-customer
    set, probed with every customer: zero false negatives by
    construction (asserted in-row by the oracle-matched counts),
    bounded false positives. The lit-bit set is ≤ n_hashes×n_bits rows
    — broadcastable at any corpus scale — and both build and probe are
    single map-side-combinable aggregations."""
    from excel_to_database_spark.operators.sketch import bloom_build, bloom_probe

    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    bloom = bloom_build(o, "o_custkey", n_hashes=3, n_bits=4096)
    hits = bloom_probe(bloom, c, "c_custkey", n_hashes=3, n_bits=4096)
    members = o.select(F.col("o_custkey").alias("item")).distinct().withColumn(
        "is_member", F.lit(True)
    )
    joined = hits.join(members, "item", "left").withColumn(
        "is_member", F.coalesce("is_member", F.lit(False))
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_probed"),
        F.sum(F.col("bloom_hit").cast("int")).cast("bigint").alias("n_bloom_hits"),
        F.sum(F.col("is_member").cast("int")).cast("bigint").alias("n_members"),
        F.sum((F.col("bloom_hit") & ~F.col("is_member")).cast("int"))
        .cast("bigint")
        .alias("n_false_positives"),
        F.sum((~F.col("bloom_hit") & F.col("is_member")).cast("int"))
        .cast("bigint")
        .alias("n_false_negatives"),
    )


@query(
    "q113_lateral_topk",
    """
    SELECT n_name, c_custkey, c_acctbal
    FROM nation,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer
             WHERE c_nationkey = n_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC
             LIMIT 3) top_c
    """,
)
def q113_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-3 customers per nation by
    balance) — the per-row-subquery SQL surface. Catalyst decorrelates
    the LATERAL ... LIMIT into a partitioned window under the hood, so
    the plan is the same one shuffle as an explicit rank filter."""
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n_name, c_custkey, c_acctbal
        FROM nation,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey ASC
                 LIMIT 3) top_c
        """
    )
