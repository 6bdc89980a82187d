"""Round-12 web-corpus operators: URL canonicalization and
within-document line dedup."""

import pyspark.sql.functions as F

from excel_to_database_spark.operators import text as T
from excel_to_database_spark.operators import web as W


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r["c"] for r in df.select(W.canonical_url(F.col("url")).alias("c")).collect()]


def test_canonical_url_rules(spark):
    got = _canon(
        spark,
        [
            # scheme/host case, www, default port, fragment, trailing slash
            "HTTP://WWW.Example.COM:80/a/b/#frag",
            # https default port; tracking params dropped; params sorted
            "https://Example.com:443/a?utm_source=x&b=2&a=1",
            # non-default port survives; root path added
            "https://example.com:8443",
            # only tracking params -> no '?'
            "http://example.com/p?utm_campaign=z&fbclid=abc",
            # root path trailing slash is kept (path == '/')
            "https://example.com/",
        ],
    )
    assert got == [
        "http://example.com/a/b",
        "https://example.com/a?a=1&b=2",
        "https://example.com:8443/",
        "http://example.com/p",
        "https://example.com/",
    ]


def test_canonical_url_idempotent(spark):
    """Canonicalizing a canonical URL is a no-op (fixed point)."""
    urls = [
        "HTTP://WWW.Example.COM:80/a/b/#frag",
        "https://Example.com:443/a?utm_source=x&b=2&a=1",
        "https://sub.example.com:8443/x?z=1&y=2",
    ]
    once = _canon(spark, urls)
    assert _canon(spark, once) == once


def test_url_host_dup_report(spark):
    """www/case/port/tracking variants of one page collapse to one
    canonical URL; a genuinely different path does not."""
    rows = [
        (1, "http://WWW.a.com/p/1"),
        (2, "HTTP://a.com:80/p/1/"),
        (3, "http://a.com/p/1?utm_source=x"),
        (4, "http://a.com/p/2"),
        (5, "https://b.com/q"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r["host"]: r for r in W.url_host_dup_report(df, "id", "url").collect()}
    assert out["a.com"]["n_urls"] == 4
    assert out["a.com"]["n_canonical"] == 2  # /p/1 (x3 collapsed) + /p/2
    assert out["a.com"]["n_dup"] == 2
    assert out["b.com"]["n_urls"] == 1 and out["b.com"]["n_dup"] == 0


def test_intradoc_line_dedup_hand_case(spark):
    """First occurrence survives, later normalized repeats drop, empty
    lines always survive, order is preserved."""
    text = "nav menu\nbody one\nnav menu \n\nbody two\nnav menu"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = T.intradoc_line_dedup(df, "doc_id", "text").collect()[0]
    assert r["clean_text"] == "nav menu\nbody one\n\nbody two"
    assert r["n_lines"] == 6 and r["n_removed"] == 2


def test_intradoc_line_dedup_no_shuffle_plan(spark):
    """Scale contract: the operator is a pure per-row projection —
    no Exchange anywhere in its physical plan."""
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a\nb\na").alias("text")
    )
    plan = (
        T.intradoc_line_dedup(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
