"""Scan-count audit (round-16): for EVERY registered query, count the
parquet FileScan nodes per base table in the optimized physical plan
and flag queries that scan the same table more than once — the
duplicated-subtree class behind the q213/q215/q217/q177/q178/q180/q168
fixes. A >1 count is a LEAD, not a verdict: some queries legitimately
join a table to itself (self-joins, as-of, edit-distance) — the audit
output is the worklist for a human read.

Usage: python scripts/scan_audit.py [query ...]   (default: all)
Env: CHECK_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")

    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.queries import QUERIES
    from excel_to_database_spark.session import get_session

    # isolated warehouse: constructing a streaming query's plan runs
    # its sink body (saveAsTable), and the default cwd-shared
    # spark-warehouse/ path would collide with any concurrent sweep
    # of the same query (the check_correctness.py note)
    import tempfile

    spark = get_session(
        "scan-audit",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="etds_audit_wh_")
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])
    names = [n for n in sorted(QUERIES) if not only or n in only]
    flagged = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — audit must finish
            print(f"ERR  {name}: {type(exc).__name__}: {exc}", flush=True)
            deep_evict(spark)
            continue
        # counting lives in plan_lint.count_table_scans since round 17
        # (the same function the correctness sweep's multi-scan lint
        # gates on — one implementation, no drift): distinct node ids
        # per table from the detail blocks' Location: lines (the
        # round-16 fix for the vacuous header-line regex; AQE prints
        # cached relations under both Final and Initial plan)
        from excel_to_database_spark.operators.plan_lint import count_table_scans

        counts = count_table_scans(plan)
        multi = {t: c for t, c in counts.items() if c > 1}
        tag = "MULTI" if multi else "ok  "
        if multi:
            flagged.append((name, multi))
        print(f"{tag} {name}: {counts}", flush=True)
        deep_evict(spark)
    print("\n== queries scanning a table >1x ==", flush=True)
    for name, multi in flagged:
        print(f"  {name}: {multi}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
