"""One-off phase profiler for the IVF-PQ build (q146): times the
training collect, the fused assignment+coding corpus pass (to a
throwaway count), each index write, and the post-write stats pass,
so wall-clock regressions can be attributed to a phase instead of
guessed at. Not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from excel_to_database_spark.operators import deep_evict
    from excel_to_database_spark.operators import similarity as S
    from excel_to_database_spark.queries.llm_ops import _IVF_PQ_PARAMS
    from excel_to_database_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("q146-profile")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    print(f"# embeddings rows: {n}", file=sys.stderr)

    # warm codegen once at the smallest sf
    import tempfile

    warm = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm):
        S.build_ivf_pq_index(
            spark.read.parquet(f"{warm}/embeddings.parquet"),
            "vec_id", "embedding", tempfile.mkdtemp(prefix="q146p_warm_"),
            **_IVF_PQ_PARAMS,
        ).collect()

    for rep in range(3):
        deep_evict(spark)
        path = tempfile.mkdtemp(prefix="q146p_")
        t0 = time.perf_counter()
        stats = S.build_ivf_pq_index(
            emb, "vec_id", "embedding", path, **_IVF_PQ_PARAMS
        )
        t_build = time.perf_counter()
        stats.collect()
        t_stats = time.perf_counter()
        print(
            f"# rep{rep}: build(writes)={t_build - t0:.2f}s "
            f"stats-agg={t_stats - t_build:.2f}s total={t_stats - t0:.2f}s",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
