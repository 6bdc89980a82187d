"""q76 root-cause instrument (round-12 judge demand): the LSH
bucket-population histogram at 1x / 10x / 30x.

The question it answers: does candidate-pair mass (Σ c·(c−1)/2 over
(band, sig) buckets, i.e. the self-join's output size) grow linearly
with the corpus — the design claim — or do SUB-CAP bucket populations
grow with corpus size and make the banded join quadratic past 10x
(the alternative hypothesis for q76's recorded 8.05x 30x slope)?

For each scale the script computes, over the exact q76 configuration
(3-word shingles → 16 md5 MinHashes → 4 bands × 4 rows,
``max_bucket=1024``):

* n_docs, n_buckets (populated), bucket-size p50/p90/p99/max
* pair_mass  = Σ c·(c−1)/2  — candidate pairs BEFORE the distinct
* n_hot      = buckets over the 1024 cap (star fallback territory)
* shingle posting-list p99/max + shingle pair mass (the truth join's
  cost driver, for contrast)

All statistics are integer aggregations over the banded frame — no
pair join is executed, so the probe is cheap even where the join
would not be.

Usage: python scripts/bucket_histogram.py [scaled_dir_10x scaled_dir_30x]
(base read from $SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1;
missing scaled dirs are synthesized via scale_slope.build_scaled_dir).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def bucket_stats(spark, sf_dir: str) -> dict:
    from excel_to_database_spark.operators import dedup as D
    from excel_to_database_spark.operators.caching import pin

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = pin(D.shingles(docs, "doc_id", "text", 3))
    sig = D.minhash_signatures(sh, num_hashes=16)
    banded = pin(D._banded(sig, bands=4, rows=4))

    sizes = pin(
        banded.groupBy("band", "sig").agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
    )
    row = sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("bigint")).alias("pair_mass"),
        F.max("c").alias("max_bucket"),
        F.expr("percentile(c, 0.5)").alias("p50"),
        F.expr("percentile(c, 0.9)").alias("p90"),
        F.expr("percentile(c, 0.99)").alias("p99"),
        F.sum(F.when(F.col("c") > 1024, 1).otherwise(0)).alias("n_hot"),
        # pair mass carried by sub-cap buckets only (what the cold
        # join actually executes; hot buckets take the star path)
        F.sum(
            F.when(F.col("c") <= 1024, (F.col("c") * (F.col("c") - 1) / 2))
            .otherwise(0)
            .cast("bigint")
        ).alias("cold_pair_mass"),
    ).collect()[0]

    posting = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    prow = posting.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("c") * (F.col("c") - 1) / 2).cast("bigint")).alias("pair_mass"),
        F.max("c").alias("max_list"),
        F.expr("percentile(c, 0.99)").alias("p99"),
    ).collect()[0]

    n_docs = docs.count()
    out = {
        "n_docs": n_docs,
        "buckets": {
            "n": row["n_buckets"],
            "pair_mass": row["pair_mass"],
            "cold_pair_mass": row["cold_pair_mass"],
            "max": row["max_bucket"],
            "p50": row["p50"],
            "p90": row["p90"],
            "p99": row["p99"],
            "n_hot_over_cap": row["n_hot"],
        },
        "shingle_postings": {
            "n": prow["n_shingles"],
            "pair_mass": prow["pair_mass"],
            "max": prow["max_list"],
            "p99": prow["p99"],
        },
    }
    for f in (sizes, banded, sh):
        f.unpersist()
    return out


def main() -> None:
    from excel_to_database_spark.session import get_session
    from scripts.scale_slope import build_scaled_dir

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("bucket-histogram")
    spark.sparkContext.setLogLevel("ERROR")

    dirs = {"1x": base_dir}
    argv = sys.argv[1:]
    dirs["10x"] = argv[0] if len(argv) > 0 else build_scaled_dir(spark, base_dir, 10)
    dirs["30x"] = argv[1] if len(argv) > 1 else build_scaled_dir(spark, base_dir, 30)

    out = {}
    for tag, d in dirs.items():
        out[tag] = bucket_stats(spark, d)
        print(f"# {tag}: {json.dumps(out[tag])}", file=sys.stderr)

    # the verdict: linear growth keeps pair_mass/n_docs ~constant
    base_ratio = out["1x"]["buckets"]["pair_mass"] / out["1x"]["n_docs"]
    for tag in ("10x", "30x"):
        r = out[tag]["buckets"]["pair_mass"] / out[tag]["n_docs"]
        out[tag]["pairs_per_doc_vs_1x"] = round(r / base_ratio, 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
