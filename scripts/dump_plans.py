"""Dump ``.explain('formatted')`` for the named queries to files —
the per-round before/after plan evidence under ``plans/r<NN>/``.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX query [query...]
Writes OUTDIR/<query>_<SUFFIX>.txt. Env: CHECK_SF_DIR (default
/root/testdata/sf0.1) — the plan, not the timing, is the artifact.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.1")

    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.queries import QUERIES
    from excel_to_database_spark.session import get_session

    spark = get_session("plans-dump", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"# {name}: not registered, skipped", file=sys.stderr)
            continue
        df = QUERIES[name](spark, sf)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — .explain('formatted') at {sf}\n\n")
            fh.write(buf.getvalue())
        print(f"# wrote {path}", file=sys.stderr)
        deep_evict(spark)


if __name__ == "__main__":
    main()
