"""RUNTIME scan audit (round-16): measure the Hadoop local-FS bytes
each registered query actually reads — construction (builder-internal
checkpoints/collects run here) PLUS one noop-sink materialization —
and compare against single-scan reference bytes per base table.

Why this exists: `scripts/scan_audit.py` counts FileScan nodes in the
RETURNED plan, but a build that materializes during query
construction (group_rank/global_rank localCheckpoints, the CC edge
checkpoint) executes its scans before the plan is ever returned and
then vanishes from it as a LogicalRDD leaf — a plan-text audit
provably cannot see those scans (the round-14 verdict's point about
q213, generalized). The Hadoop FileSystem statistics counter sees
every byte the JVM reads from `file://`, so construction-time scans
are charged to the query that ran them.

Output per query: total bytes read, the per-table single-full-scan
reference, the tables named by the query's DuckDB oracle, and the
ratio bytes / Σ(referenced tables' single scans). Ratios are LEADS,
not verdicts — legitimate >1x causes include self-joins reading via
their own checkpoint (ratio stays ~1), pushed-filter probes that book
checksummed page reads (the q217 qv artifact), and streaming/sink
queries that write + re-read their own temp parquet (their bytes
include the side artifact; they are annotated, not skipped). A ratio
well above 1 on a pure batch query is the re-scan class.

Usage: python scripts/runtime_scan_audit.py [query ...]  (default all)
Env: CHECK_SF_DIR (default /root/testdata/sf0.001).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings media"
).split()


def _fs_bytes_read(spark) -> int:
    """Sum of Hadoop local-FS bytes read in this JVM (local mode: the
    executor threads share the driver JVM, so this is the total
    runtime input volume since session start)."""
    total = 0
    stats = spark.sparkContext._jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics()
    for i in range(stats.size()):
        s = stats.get(i)
        if s.getScheme() == "file":
            total += s.getBytesRead()
    return total


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.001")

    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.queries import ORACLES, QUERIES
    from excel_to_database_spark.session import get_session

    # isolated warehouse: executing a streaming query runs its
    # saveAsTable sink — the cwd-shared default warehouse path would
    # collide with any concurrent run of the same query (the
    # check_correctness.py note)
    import tempfile

    spark = get_session(
        "runtime-scan-audit",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="etds_rtaudit_wh_")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # single-full-scan reference per table: a noop write computes every
    # column of every row (guide §1.4), so this is the cost of reading
    # the whole table once, including the footer read
    ref: dict[str, int] = {}
    for tbl in TABLES:
        path = f"{sf}/{tbl}.parquet"
        if not os.path.exists(path):
            continue
        b0 = _fs_bytes_read(spark)
        if tbl == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _noop(spark.read.parquet(path))
        ref[tbl] = _fs_bytes_read(spark) - b0
    print(f"# single-scan reference bytes at {sf}: {ref}", flush=True)

    only = set(sys.argv[1:])
    names = [n for n in sorted(QUERIES) if not only or n in only]
    rows = []
    for name in names:
        oracle = ORACLES.get(name, "") or ""
        tabs = sorted(
            tbl
            for tbl in ref
            if re.search(rf"\b{tbl}\b", oracle)
        )
        denom = sum(ref[tbl] for tbl in tabs) or None
        deep_evict(spark)
        b0 = _fs_bytes_read(spark)
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, sf)  # builder checkpoints run here
            b_mid = _fs_bytes_read(spark)
            _noop(df)
        except Exception as exc:  # noqa: BLE001 — audit must finish
            print(f"ERR  {name}: {type(exc).__name__}: {exc}", flush=True)
            deep_evict(spark)
            continue
        b1 = _fs_bytes_read(spark)
        el = time.perf_counter() - t0
        ratio = round((b1 - b0) / denom, 2) if denom else None
        rows.append(
            {
                "query": name,
                "bytes": b1 - b0,
                "bytes_construction": b_mid - b0,
                "ref_tables": tabs,
                "ref_bytes": denom,
                "ratio": ratio,
                "sec": round(el, 2),
            }
        )
        print(
            f"{name}: {b1 - b0}b (construction {b_mid - b0}b) "
            f"ref={denom} ratio={ratio}",
            flush=True,
        )
        deep_evict(spark)
    out = os.environ.get("RUNTIME_SCAN_AUDIT_OUT", "/tmp/runtime_scan_audit.json")
    with open(out, "w") as f:
        json.dump({"sf": sf, "ref": ref, "rows": rows}, f, indent=1)
    print(f"# wrote {out}", flush=True)
    hi = [r for r in rows if r["ratio"] and r["ratio"] > 1.3]
    print("\n== ratio > 1.3 (leads, not verdicts) ==", flush=True)
    for r in sorted(hi, key=lambda r: -(r["ratio"] or 0)):
        print(f"  {r['query']}: {r['ratio']}x ({r['bytes']}b)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
