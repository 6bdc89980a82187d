"""Round-13: hashed-n-gram linear quality classifier (fastText shape)."""

import hashlib
from fractions import Fraction

import pyspark.sql.functions as F

from excel_to_database_spark.operators import text as T


def _bucket(gram, salt, n_buckets):
    return int(hashlib.md5(f"{salt}:{gram}".encode()).hexdigest()[:4], 16) % n_buckets


def _weight(b, salt="fqw"):
    return int(hashlib.md5(f"{salt}:{b}".encode()).hexdigest()[:4], 16) % 17 - 8


def _grams(text):
    w = text.strip().lower().split()
    w = w if w else [""]
    return w + [f"{a}_{b}" for a, b in zip(w, w[1:])]


def test_hashed_ngram_score_hand_computed(spark):
    """Score equals the independent Python recompute: unigrams +
    adjacent bigrams, md5 bucket, fixture weights, exact integer sum."""
    rows = [(1, "The quick brown fox"), (2, "one"), (3, "a a a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wt = T.hashed_ngram_weights(spark, n_buckets=64)
    out = {
        r["doc"]: r
        for r in T.hashed_ngram_score(df, "doc_id", "text", wt, n_buckets=64).collect()
    }
    for doc_id, text in rows:
        grams = _grams(text)
        want = sum(_weight(_bucket(g, "fq", 64)) for g in grams)
        r = out[doc_id]
        assert r["n_grams"] == len(grams)
        assert r["sum_weight"] == want
        assert r["score"] == want / len(grams)
        assert r["keep"] == (want > 0)


def test_hashed_ngram_score_threshold_boundary(spark):
    """The keep decision is an integer cross-product — exact AT the
    boundary: a doc whose mean weight equals the threshold is dropped
    (strict >), one epsilon above survives."""
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    # constant weights = 2 for every bucket -> sum = 2·n, mean = 2
    wt = spark.range(4096).select(
        F.col("id").cast("int").alias("bucket"), F.lit(2).cast("bigint").alias("weight")
    )
    at = T.hashed_ngram_score(df, "doc_id", "text", wt, threshold=Fraction(2)).collect()[0]
    below = T.hashed_ngram_score(
        df, "doc_id", "text", wt, threshold=Fraction(199, 100)
    ).collect()[0]
    assert at["keep"] is False and below["keep"] is True


def test_hashed_ngram_score_broadcast_plan(spark):
    """Scale contract: the weight lookup is a BroadcastHashJoin (never
    a shuffle join) and the only hash-partitioning shuffles are the
    deliberate spread + the final per-doc aggregation."""
    df = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("alpha beta gamma "), F.col("id").cast("string")).alias("text"),
    )
    wt = T.hashed_ngram_weights(spark, n_buckets=256)
    plan = (
        T.hashed_ngram_score(df, "doc_id", "text", wt, n_buckets=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2  # spread + final agg
