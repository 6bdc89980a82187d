"""Cross-validation against independent implementations: MLlib's
MinHashLSH and numpy brute force. The DuckDB oracles already verify
engine-portability; these verify the *algorithms* against third-party
code paths."""

import numpy as np
import pyspark.sql.functions as F

from excel_to_database_spark.operators.dedup import jaccard_pairs, shingles
from excel_to_database_spark.operators.similarity import cosine_topk


def test_knn_matches_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T

    got = cosine_topk(
        emb, "vec_id", "embedding", k=3, query_filter=F.col("id") < 10, exact=False
    ).collect()
    for r in got:
        qi = int(np.where(ids == r["query_id"])[0][0])
        ni = int(np.where(ids == r["neighbor_id"])[0][0])
        assert abs(S[qi, ni] - r["cosine"]) < 1e-9
    # top-1 neighbor agrees with numpy argmax
    for q in range(min(10, len(ids))):
        s = S[q].copy()
        s[q] = -2
        best = ids[int(np.argmax(s))]
        spark_best = [r["neighbor_id"] for r in got if r["query_id"] == ids[q] and r["rank"] == 1]
        assert spark_best == [best]


def test_jaccard_matches_mllib_minhash(spark):
    """Exact Jaccard distances agree with MLlib's approxSimilarityJoin
    (keyDistance = exact Jaccard on the vectorized shingle sets)."""
    try:
        from pyspark.ml.feature import CountVectorizer, MinHashLSH
    except ImportError:  # MLlib absent → skip silently
        import pytest

        pytest.skip("MLlib not available")

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog yesterday"),
            (3, "completely different content about spark query engines"),
            (4, "the quick brown fox leaps over the lazy dog today"),
        ],
        "doc_id long, text string",
    )
    sh = shingles(docs, "doc_id", "text", 3)
    ours = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(sh, 0.01).collect()
    }

    grouped = sh.groupBy("doc").agg(F.collect_list("shingle").alias("sh"))
    cv = CountVectorizer(inputCol="sh", outputCol="features", binary=True).fit(grouped)
    feats = cv.transform(grouped)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42).fit(feats)
    pairs = (
        mh.approxSimilarityJoin(feats, feats, 0.99, distCol="jd")
        .filter(F.col("datasetA.doc") < F.col("datasetB.doc"))
        .select(
            F.col("datasetA.doc").alias("a"), F.col("datasetB.doc").alias("b"), "jd"
        )
        .collect()
    )
    mllib = {(r["a"], r["b"]): 1.0 - r["jd"] for r in pairs}
    for key, j in mllib.items():
        assert abs(ours.get(key, 0.0) - j) < 1e-9, (key, j, ours.get(key))


def test_minhash_rotation_family_matches_python_model(spark):
    """The Spark signature pipeline reproduces an independent pure-
    Python model of the family definition (shingle = lowercase
    whitespace 3-gram; member i = lexicographic MIN over shingles of
    md5(shingle) rotated left by 2*i hex chars). Locks both the Spark
    expressions and the SQL oracles — which state the same definition —
    against drift."""
    import hashlib
    import re

    from excel_to_database_spark.operators import dedup as D

    rows = [
        (i, f"tok{i} alpha beta gamma delta tok{i * 7 % 5} epsilon zeta eta")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def model(text):
        w = re.split(r"\s+", text.lower().strip())
        sh = {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
        hs = [hashlib.md5(s.encode()).hexdigest() for s in sh]
        return [min(h[2 * i :] + h[: 2 * i] for h in hs) for i in range(16)]

    got = {
        r["doc"]: [r[f"h{i}"] for i in range(16)]
        for r in D.minhash_signatures(D.shingles(df, "doc_id", "text", 3), 16).collect()
    }
    assert got == {i: model(t) for i, t in rows}


def test_blocked_cosine_pairs_matches_numpy(spark):
    """The block-pair Gram sieve + decimal rescore finds exactly the
    pairs an independent numpy all-pairs scan finds — in particular no
    pair may be lost to cross-block orientation (larger id in the
    lower-numbered block)."""
    import hashlib

    import numpy as np

    from excel_to_database_spark.operators.similarity import cosine_pairs

    def vec(i):
        h = hashlib.md5(f"v{i}".encode()).digest()
        return [((b / 255.0) * 2 - 1) for b in h[:8]]

    rows = [(i, vec(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    V = np.array([np.array(v, dtype=np.float32).astype(np.float64) for _, v in rows])
    n = np.sqrt((V * V).sum(axis=1))
    cos = (V @ V.T) / np.outer(n, n)
    thr = 0.5
    expect = {
        (a, b)
        for a in range(40)
        for b in range(a + 1, 40)
        if cos[a, b] >= thr
    }
    assert expect, "fixture must produce at least one qualifying pair"
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in cosine_pairs(df, "vec_id", "embedding", threshold=thr, n_blocks=4).collect()
    }
    assert set(got) == expect
    for (a, b), c in got.items():
        assert abs(c - cos[a, b]) < 1e-9
