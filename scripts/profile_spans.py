"""One-off phase profiler for the char-span dedup (q157) and the
edit-1 fuzzy join (q151) at a scale factor: attributes the scaled
wall-clock to phases (window index build, shared-rep agg, edge join,
connected components / variant index, candidate join, verify) so slope
work targets the real bottleneck. Not part of the bench contract.

Usage: python scripts/profile_spans.py [factor] [--keep DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, fn):
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"# {label}: {dt:.2f}s ({n} rows)", file=sys.stderr)
    return dt


def main() -> None:
    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.operators import dedup as D
    from excel_to_database_spark.session import get_session
    from scripts.scale_slope import build_scaled_dir

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_session("span-profile")
    spark.sparkContext.setLogLevel("ERROR")

    if len(sys.argv) > 3 and sys.argv[2] == "--keep":
        scaled = sys.argv[3]
    else:
        scaled = build_scaled_dir(spark, sf_dir, factor)
        print(f"# scaled dir: {scaled}", file=sys.stderr)

    docs = spark.read.parquet(f"{scaled}/documents.parquet")

    deep_evict(spark)
    # q157 phases
    g = D.char_shingles(docs, "doc_id", "text", n=50).select(
        "doc", F.unhex(F.md5("shingle")).alias("h")
    )
    t("q157 index+digest+groupBy (reps)", lambda: (
        g.groupBy("h").agg(F.min("doc").alias("rep"), F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1).count()
    ))
    deep_evict(spark)
    reps = (
        g.groupBy("h")
        .agg(F.min("doc").alias("rep"), F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h", "rep")
    )
    edges = (
        g.join(reps.hint("shuffle_hash"), "h")
        .filter(F.col("doc") != F.col("rep"))
        .select(F.col("rep").alias("doc_a"), F.col("doc").alias("doc_b"))
        .distinct()
    )
    t("q157 edges (index pass 2 + join + distinct)", edges.count)
    plan = edges._jdf.queryExecution().executedPlan().toString()
    print(f"# q157 edge-plan ReusedExchange: {'ReusedExchange' in plan}",
          file=sys.stderr)
    deep_evict(spark)
    t("q157 full (edges + CC)", lambda: D.char_span_dedup(
        docs, "doc_id", "text", min_len=50).count())

    # q151 phases
    cust = spark.read.parquet(f"{scaled}/customer.parquet")
    deep_evict(spark)
    base = cust.select(F.col("c_custkey").alias("id"), F.col("c_name").alias("s"))
    base = base.repartition(spark.sparkContext.defaultParallelism)
    s = F.col("s")
    variants = F.array_union(
        F.array(s),
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
            lambda i: F.concat(
                F.substring(s, F.lit(1), i - 1), s.substr(i + 1, F.length(s))
            ),
        ),
    )
    idx = base.select("id", F.explode(variants).alias("vs")).select(
        "id", F.xxhash64("vs").alias("v")
    )
    t("q151 variant index", idx.count)
    deep_evict(spark)
    a = idx.select(F.col("id").alias("id_a"), "v")
    b = idx.select(F.col("id").alias("id_b"), "v")
    cand = (
        a.join(b.hint("shuffle_hash"), "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b")
    )
    t("q151 candidates (2x index + join + dedup)", cand.count)
    deep_evict(spark)
    t("q151 full (edit1_pairs)", lambda: D.edit1_pairs(
        cust, "c_custkey", "c_name").count())


if __name__ == "__main__":
    main()
