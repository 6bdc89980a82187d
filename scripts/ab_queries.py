"""Ad-hoc per-query timing harness for optimization A/Bs: bench.py
methodology (sf0.001 codegen warm-up, BENCH_REPS-median, deep_evict
between reps) over an explicit query list, without the full headline
suite. NOT part of the bench contract — the driver's number stays
bench.py's.

Usage: python scripts/ab_queries.py q177_signal_agreement [more...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2


def main() -> None:
    import tempfile

    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.queries import QUERIES
    from excel_to_database_spark.session import get_session

    names = sys.argv[1:]
    if not names:
        print("usage: ab_queries.py <query> [query...]", file=sys.stderr)
        raise SystemExit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_session(
        "etds-ab",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="etds_ab_wh_")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(sf_dir):
        for name in names:
            QUERIES[name](spark, warm_dir).count()
        deep_evict(spark)

    timings = {}
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        reps = []
        for _ in range(reps_n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(round(time.perf_counter() - t0, 3))
            deep_evict(spark)
        timings[name] = {"median": round(_median(reps), 3), "reps": reps}
        print(f"# {name}: median {timings[name]['median']}s of {reps}", file=sys.stderr)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
