"""JDBC warehouse *source*: read a warehouse table back into Spark —
the reverse of the JdbcDestination sink (reference's warehouse is
write-only; round-tripping is the natural engine extension).

Scale design: a naive ``spark.read.jdbc`` issues ONE query over ONE
connection — a single-task scan no matter how large the cluster. This
reader partitions on a numeric column so N executors each pull a
bounded stripe (``WHERE col BETWEEN ...`` per task, planned by Spark's
JDBCRelation), and it leaves filters to Spark's JDBC pushdown so the
warehouse prunes before shipping rows. Bounds are either supplied by
the caller or discovered with one MIN/MAX probe query (a 1-row
result — bounded driver work, same class as the merge path's
partition-values collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
    partition_col: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Load ``table`` (a name or a ``(subquery) alias``) over JDBC.

    With ``partition_col``, the scan is split into ``num_partitions``
    range stripes; missing bounds are discovered via one MIN/MAX probe.
    Without it, the read is single-connection (fine for dimension-size
    tables; document scans should always pass a partition column)."""
    props = properties or {}

    def reader(dbtable: str):
        r = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
        return r.options(**props)

    if partition_col is None:
        return reader(table).load()

    if lower_bound is None or upper_bound is None:
        # quote through Spark's per-dialect rule: warehouses disagree on
        # unquoted-identifier case folding (Derby/Oracle fold UP, the
        # writer creates quoted lower-case names)
        q = spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url).quoteIdentifier(
            partition_col
        )
        probe = reader(
            f"(SELECT MIN({q}) AS lo, MAX({q}) AS hi FROM {table}) bounds_probe"
        ).load().first()
        # JDBC dialects differ on identifier case in result metadata
        d = {k.lower(): v for k, v in probe.asDict().items()}
        lower_bound = int(d["lo"]) if lower_bound is None else lower_bound
        upper_bound = int(d["hi"]) if upper_bound is None else upper_bound

    return (
        reader(table)
        .option("partitionColumn", partition_col)
        .option("lowerBound", lower_bound)
        .option("upperBound", upper_bound)
        .option(
            "numPartitions",
            num_partitions or spark.sparkContext.defaultParallelism,
        )
        .load()
    )
