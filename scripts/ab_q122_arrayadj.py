"""A/B: q122 PageRank with an ARRAY adjacency (one row per src,
collect_list(dst)) vs the shipped flat per-edge adjacency.

Hypothesis from the round-12 clean-window A/B (`ab_q122_bucketed.py`):
q122's 30x slope (~8x, steal-free reps) is real linear work — 5
supersteps hash-probing a 70M-row flat adjacency. The array form
changes the per-superstep join cardinality from |E| to |V| (~30x
smaller): the probe-side heavy lifting becomes an explode of packed
bigint arrays (codegen'd generate in the SAME stage as the join,
~5-10x cheaper per element than a hash-join probe), and the build
replaces the window's per-partition |E| sort with a hash aggregate.
Integer arithmetic is per-src (share = rank div deg computed once per
src row, exploded unchanged), so the fixed point is bit-identical.

Usage: python scripts/ab_q122_arrayadj.py [scaled_dir] [reps]
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


def q122_arrayadj(spark, sf_dir: str):
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
    from excel_to_database_spark.operators.caching import pin

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    adj = pin(
        edges.repartition(n_shuffle, "src")
        .groupBy("src")
        .agg(
            F.collect_list("dst").alias("dsts"),
            F.count(F.lit(1)).cast("bigint").alias("deg"),
        )
    )
    nn = pin(adj.agg(F.count(F.lit(1)).alias("n")))
    ranks = adj.select("src").crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"),
        F.expr("1000000000000 div n").cast("bigint").alias("rank"),
    )
    for _ in range(5):
        contrib = (
            ranks.hint("shuffle_hash")
            .join(adj, ranks.node == adj.src)
            .select(
                F.expr("rank div deg").alias("share"),
                F.explode("dsts").alias("node2"),
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
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="ab_q122a_wh_")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = (
        (lambda s, d: QUERIES["q122_pagerank"](s, d))
        if variant == "flat"
        else q122_arrayadj
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
    top = [(r["node"], r["rank"]) for r in rows]
    spark.stop()
    return {"min": min(ts), "reps": ts, "steal_s": steals, "top": top}


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        print(json.dumps(_run_point(sys.argv[2], sys.argv[3], int(sys.argv[4]))))
        return
    scaled_dir = sys.argv[1] if len(sys.argv) > 1 else None
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out: dict = {}
    for variant in ("flat", "array"):
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
            print(
                f"# {variant}/{tag}: min {r['min']}s reps {r['reps']} steal {r['steal_s']}",
                file=sys.stderr,
            )
    for variant in ("flat", "array"):
        if f"{variant}_scaled" in out:
            out[f"{variant}_slope"] = round(
                out[f"{variant}_scaled"]["min"] / out[f"{variant}_base"]["min"], 2
            )
    # the full 20-row fixed point must be IDENTICAL (same integer
    # arithmetic) — a mismatch is a correctness bug, not a perf result
    for tag in ("base", "scaled"):
        if f"flat_{tag}" in out and out[f"flat_{tag}"]["top"] != out[f"array_{tag}"]["top"]:
            out["MISMATCH"] = tag
    print(json.dumps(out))


if __name__ == "__main__":
    main()
