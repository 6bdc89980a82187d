"""A/B: q122 PageRank adjacency as a BUCKETED CATALOG TABLE vs the
shipped pinned in-memory adjacency (the round-10/11 judge suggestion
that had not been tried).

Variant A — shipped q122: adjacency repartition(32, src) + pin
(MEMORY_AND_DISK); 5 shuffle-hash supersteps against the cache.
Variant B — adjacency written ONCE per rep via
``sync.bucketing.write_bucketed`` (bucketBy src, no sortBy: the
supersteps hash-join, they never merge-sort), supersteps scan the
bucketed parquet — the bucketed read reports HashPartitioning(src, 32)
so no superstep exchanges the adjacency, at the price of 5 parquet
decodes + 1 bucketed write per run.

Protocol: fresh session per (variant, scale) point, min of ``reps``
with deep_evict between reps, /proc/stat steal delta per rep (this
sandbox runs under 15–20% hypervisor steal even at loadavg 0 —
PLANS.md round-12).

Usage: python scripts/ab_q122_bucketed.py [scaled_dir] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def q122_bucketed(spark, sf_dir: str):
    """q122 with the adjacency as a bucketed table (variant B)."""
    from pyspark.sql import Window

    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    raw = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .distinct()
    )
    edges = raw.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        raw.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    w_deg = Window.partitionBy("src")
    from excel_to_database_spark.sync.bucketing import write_bucketed

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    write_bucketed(
        edges.withColumn("deg", F.count(F.lit(1)).over(w_deg)),
        "ab_q122_adj",
        "src",
        n_buckets=n_shuffle,
        sort=False,
    )
    edges_deg = spark.table("ab_q122_adj")
    deg = edges_deg.select("src", "deg").distinct()
    from excel_to_database_spark.operators.caching import pin

    nn = pin(deg.agg(F.count(F.lit(1)).alias("n")))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"),
        F.expr("1000000000000 div n").cast("bigint").alias("rank"),
    )
    for _ in range(5):
        contrib = (
            ranks.hint("shuffle_hash")
            .join(edges_deg, ranks.node == edges_deg.src)
            .select(
                F.col("dst").alias("node2"), F.expr("rank div deg").alias("share")
            )
            .groupBy("node2")
            .agg(F.sum("share").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("node2").alias("node"),
            (
                F.expr("(15 * (1000000000000 div n)) div 100")
                + F.expr("(85 * s) div 100")
            )
            .cast("bigint")
            .alias("rank"),
        )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(
            F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint").cast("string")
        )
    )
    return (
        ranks.select(label.alias("node"), "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )


from scripts.scale_slope import steal_cs as _steal_cs


def _run_point(variant: str, sf_dir: str, reps: int) -> dict:
    from excel_to_database_spark.operators.caching import deep_evict
    from excel_to_database_spark.queries import QUERIES
    from excel_to_database_spark.session import get_session

    spark = get_session(
        f"ab-q122-{variant}",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ab_q122_wh_")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = (
        (lambda s, d: QUERIES["q122_pagerank"](s, d))
        if variant == "pinned"
        else q122_bucketed
    )
    ts, steals, rows = [], [], None
    for _ in range(reps):
        deep_evict(spark)
        s0 = _steal_cs()
        t0 = time.perf_counter()
        rows = fn(spark, sf_dir).collect()
        ts.append(round(time.perf_counter() - t0, 3))
        s1 = _steal_cs()
        steals.append(
            round((s1 - s0) / 100.0, 2)
            if s0 is not None and s1 is not None
            else None
        )
    top = [(r["node"], r["rank"]) for r in rows[:3]]
    spark.stop()
    return {"min": min(ts), "reps": ts, "steal_s": steals, "top3": top}


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        print(json.dumps(_run_point(sys.argv[2], sys.argv[3], int(sys.argv[4]))))
        return
    scaled_dir = sys.argv[1] if len(sys.argv) > 1 else None
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {}
    for variant in ("pinned", "bucketed"):
        for tag, d in (("base", base_dir), ("scaled", scaled_dir)):
            if d is None:
                continue
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", variant, d, str(reps)],
                capture_output=True,
                text=True,
                timeout=2400,
            )
            r = None
            for line in reversed(proc.stdout.strip().splitlines()):
                try:
                    r = json.loads(line)
                    break
                except ValueError:
                    continue
            if r is None:
                raise RuntimeError(f"{variant}/{tag}: no JSON; stderr: {proc.stderr[-500:]}")
            out[f"{variant}_{tag}"] = r
            print(f"# {variant}/{tag}: min {r['min']}s reps {r['reps']} steal {r['steal_s']}", file=sys.stderr)
    for variant in ("pinned", "bucketed"):
        if f"{variant}_scaled" in out:
            out[f"{variant}_slope"] = round(
                out[f"{variant}_scaled"]["min"] / out[f"{variant}_base"]["min"], 2
            )
    # identical top-3 across variants = same fixed point (sanity, not oracle)
    if out["pinned_base"]["top3"] != out["bucketed_base"]["top3"]:
        out["MISMATCH"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
