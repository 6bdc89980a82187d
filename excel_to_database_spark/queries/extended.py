"""Round-2 extensions: the remaining classic TPC-H query shapes the
inventory lacked (Q4 EXISTS-semi, Q12 conditional matrix, Q17
correlated-average threshold, Q21 multi-EXISTS self-join), plus
training-pipeline operators (deterministic weighted sampling,
incremental batch-vs-corpus dedup, token-budget mixture allocation,
winsorized robust stats, grouped least-squares via exact co-moments)
and the typed-state streaming fold (transformWithStateInPandas).

The reference computes none of these (its sole aggregate is a load-row
count, app/data.py:122 — SURVEY.md §2.3); all are extension surface
held to the same determinism contract as the rest of the inventory
(queries/base.py docstring): integer/decimal arithmetic wherever a
result feeds a comparison or a hash, identical double expression trees
where floats are unavoidable, unique tiebreakers under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from excel_to_database_spark.queries.base import dsum, query, sql_dsum, t

# ---------------------------------------------------------------------------
# TPC-H shapes over the available columns (no l_shipmode/commitdate in the
# synthetic schema: lateness is re-expressed as ship-lag vs o_orderdate)
# ---------------------------------------------------------------------------


@query(
    "q128_order_priority_exists",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q128_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi conjunct
    referencing both sides (ship-lag > 60 days stands in for
    commit-vs-receipt lateness). Catalyst plans one left-semi hash join
    on the order key with the date predicate as a join residual — the
    orders-side date window is pushed into the parquet scan, so the
    probe side is the quarter's orders, not the table."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "q129_priority_linestatus_matrix",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def q129_priority_linestatus_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + two-way conditional counting
    (CASE inside SUM). The year filter is pushed to the lineitem scan;
    the join shuffles once on the order key with partial aggregation
    before the exchange (map-side combine keeps the shuffle at
    |groups|, not |rows|)."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_lines"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_lines"),
        )
    )


@query(
    "q130_small_quantity_revenue",
    f"""
    WITH thr AS (
        SELECT l_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                      / COUNT(*)) AS avg_fifth
        FROM lineitem GROUP BY l_partkey)
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN thr ON thr.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < avg_fifth
    """,
)
def q130_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: each row compares against a correlated per-part
    average (rows under 20% of their part's mean quantity). The
    correlated scalar subquery is decorrelated by hand into one
    per-part aggregate joined back — the same rewrite Catalyst applies
    to the subquery form, made explicit so the plan is one shuffle on
    the part key plus a broadcast of the brand-filtered parts. The
    threshold routes through decimal-sum/count so both engines derive
    the bit-identical double."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    brand_lines = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    thr = (
        l.groupBy("l_partkey")
        .agg(
            (
                F.lit(0.2)
                * (
                    F.sum(F.col("l_quantity").cast("decimal(30,6)")).cast("double")
                    / F.count(F.lit(1))
                )
            ).alias("avg_fifth")
        )
    )
    return (
        brand_lines.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("avg_fifth"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(30,6)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


@query(
    "q131_waiting_suppliers",
    """
    WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY),
    multi AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1),
    only_late AS (
        SELECT l_orderkey FROM late GROUP BY l_orderkey HAVING COUNT(*) = 1)
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late
    JOIN multi USING (l_orderkey)
    JOIN only_late USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q131_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on
    multi-supplier orders (EXISTS another supplier's line / NOT EXISTS
    another late one, phrased as two aggregated semi-filters — the
    decorrelated form of Q21's nested EXISTS pair). Every stage hashes
    on l_orderkey until the final tiny rollup on s_name; the supplier
    dimension is broadcast; top-20 has the name as tiebreaker."""
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    late = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    only_late = (
        late.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("nl"))
        .filter(F.col("nl") == 1)
        .select("l_orderkey")
    )
    return (
        late.join(multi, "l_orderkey")
        .join(only_late, "l_orderkey")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Training-pipeline operators
# ---------------------------------------------------------------------------


@query(
    "q132_weighted_sample",
    """
    WITH pri AS (
        SELECT doc_id, n_chars AS weight,
               CAST(('0x' || substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS h
        FROM documents)
    SELECT doc_id, CAST(weight AS BIGINT) AS weight,
           CAST((weight * 4294967296) // (h + 1) AS BIGINT) AS priority
    FROM pri
    ORDER BY priority DESC, doc_id
    LIMIT 100
    """,
)
def q132_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling): each doc draws u ~ Uniform from md5 bits and competes on
    priority = weight/u, realized as the integer (weight · 2³²) div
    (h+1) so both engines produce the same exact ranking — no floats,
    no RNG state. Top-k by (priority, doc_id) is TakeOrderedAndProject:
    per-partition top-100 partials, never a global sort. Sampling k of
    100 TB this way is one scan + one k-row merge on the driver, and
    the same hash makes the draw reproducible across reruns/backfills
    — the property a training-data lottery actually needs."""
    d = t(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            h.alias("h"),
        )
        .select(
            "doc_id",
            "weight",
            F.expr("(weight * 4294967296) div (h + 1)").cast("bigint").alias("priority"),
        )
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(100)
    )


@query(
    "q134_token_budget_mixture",
    """
    WITH tok AS (
        SELECT source, SUM((n_chars + 3) // 4) AS avail
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(avail) AS total, COUNT(*) AS n_src FROM tok)
    SELECT source,
           CAST(avail AS BIGINT) AS avail_tokens,
           CAST(LEAST(avail, (total // 2) // n_src) AS BIGINT) AS alloc_tokens
    FROM tok, tot
    """,
)
def q134_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation: a 50%-of-corpus training budget
    split fair-share across sources, capped at each source's available
    tokens (the single-round waterfill; under-filled budget from capped
    sources is surfaced by avail < alloc_fair, visible in the output).
    All integer arithmetic; the per-source rollup is one map-side
    combinable aggregation and the totals row is a broadcast — the plan
    is a single scan at any corpus size."""
    d = t(spark, sf_dir, "documents")
    # pinned (round-16): the |sources|-row aggregate feeds both the
    # totals row and the final projection — unpinned the corpus
    # aggregation ran twice (2 documents FileScans in the plan)
    tok = d.groupBy("source").agg(
        F.sum(F.expr("(n_chars + 3) div 4")).alias("avail")
    ).localCheckpoint(eager=True)
    tot = tok.agg(
        F.sum("avail").alias("total"), F.count(F.lit(1)).alias("n_src")
    )
    return (
        tok.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("avail").cast("bigint").alias("avail_tokens"),
            F.least(
                F.col("avail"), F.expr("(total div 2) div n_src")
            )
            .cast("bigint")
            .alias("alloc_tokens"),
        )
    )


@query(
    "q135_winsorized_stats",
    """
    WITH ranked AS (
        SELECT lang, n_chars,
               ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents),
    cuts AS (
        SELECT lang,
               MAX(CASE WHEN rn = CAST(CEIL(0.1 * n) AS BIGINT)
                        THEN n_chars END) AS p10,
               MAX(CASE WHEN rn = CAST(CEIL(0.9 * n) AS BIGINT)
                        THEN n_chars END) AS p90
        FROM ranked GROUP BY lang)
    SELECT d.lang,
           CAST(p10 AS BIGINT) AS p10,
           CAST(p90 AS BIGINT) AS p90,
           CAST(SUM(LEAST(GREATEST(n_chars, p10), p90)) AS BIGINT)
               AS winsorized_sum,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents d JOIN cuts USING (lang)
    GROUP BY d.lang, p10, p90
    """,
)
def q135_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (winsorized) length statistics per language: clamp
    n_chars into the [p10, p90] band before summing, with the cuts
    defined as exact rank-based (type-1) quantiles — integer order
    statistics, no interpolation, so the result is engine-exact.

    The cuts come from ``selection.exact_group_quantiles`` — ranks via
    the skew-safe group_rank build (range repartition + bounded
    (partition, lang) count read + per-group offsets), NEVER
    ``Window.partitionBy(lang)`` on the data path: ``lang`` is the
    textbook low-cardinality key, and a lang-only window funnels each
    language's entire 100 TB slice into one task (the round-15 `weak`
    mark, retired here). The per-lang cut table is ≤|langs| rows,
    broadcast back onto the corpus for one clamp-and-sum pass.

    The clamp-and-sum pass rides the build's OWN checkpoint-backed
    (lang, n_chars, doc_id) frame (``return_ranked``, round-16): the
    rank build executes during construction, so joining the cuts back
    onto a fresh ``documents`` scan paid a second runtime read of the
    same three columns — invisible to the plan audit because the build
    is a LogicalRDD leaf in the returned plan (measured at sf0.001:
    2.0× one reference scan before, 1.0× after; guide §2.3)."""
    from excel_to_database_spark.operators.selection import exact_group_quantiles

    d = t(spark, sf_dir, "documents")
    cuts, base = exact_group_quantiles(
        d.select("lang", "n_chars", "doc_id"),
        "lang",
        "n_chars",
        "doc_id",
        (10, 90),
        return_ranked=True,
    )
    cuts = cuts.select("lang", "p10", "p90")
    return (
        base.join(F.broadcast(cuts), "lang")
        .groupBy("lang", "p10", "p90")
        .agg(
            F.sum(
                F.least(F.greatest(F.col("n_chars"), F.col("p10")), F.col("p90"))
            )
            .cast("bigint")
            .alias("winsorized_sum"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "lang",
            F.col("p10").cast("bigint").alias("p10"),
            F.col("p90").cast("bigint").alias("p90"),
            "winsorized_sum",
            "n_docs",
        )
    )


@query(
    "q136_regression_by_group",
    """
    WITH sums AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                        * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                        * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                        * CAST(l_extendedprice AS DECIMAL(19,6))) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS slope,
           ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n,
                 6) AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 12) AS r2
    FROM sums
    """,
)
def q136_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares (extendedprice ~ quantity per returnflag)
    from exact co-moments: the five sums route through decimal (exact,
    order-independent), then slope/intercept/R² are derived with the
    bit-identical double expression tree on both engines. One map-side
    combinable aggregation — the classic single-pass distributed
    regression, shuffling 6 numbers per group regardless of scale."""
    l = t(spark, sf_dir, "lineitem")
    # co-moment products are formed in DECIMAL (cast each factor, then
    # multiply exactly) — a double product of 1e10 magnitude has ulp
    # comparable to the 1e-6 decimal grain, so rounding the PRODUCT is
    # engine-dependent while rounding the ~1e5 FACTORS is not
    dec = lambda c: c.cast("decimal(30,6)")
    d19 = lambda c: c.cast("decimal(19,6)")
    q_, p_ = F.col("l_quantity"), F.col("l_extendedprice")
    sums = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(q_)).cast("double").alias("sx"),
        F.sum(dec(p_)).cast("double").alias("sy"),
        F.sum(d19(q_) * d19(q_)).cast("double").alias("sxx"),
        F.sum(d19(q_) * d19(p_)).cast("double").alias("sxy"),
        F.sum(d19(p_) * d19(p_)).cast("double").alias("syy"),
    )
    # derived statistics are rounded on BOTH engines, scale matched to
    # each column's magnitude (grain >> ulp noise, << reporting need):
    # the co-moment sums are exact, but compilers may contract the
    # multiply-subtract chains into FMAs, so the raw doubles can differ
    # in the last ulp across engines
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return sums.select(
        "l_returnflag",
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
        F.round(
            (num * num)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            12,
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Incremental dedup (batch vs corpus) and typed-state streaming
# ---------------------------------------------------------------------------


def _sql_inc_minhash() -> str:
    """Corpus/batch split + banded signatures, mirroring
    operators/dedup.py's md5-min family (same construction as the q76
    oracle, plus the membership split)."""
    from excel_to_database_spark.queries.llm_ops import _sql_rot_mins

    bands = " UNION ALL ".join(
        "SELECT doc, {b} AS band, {sig} AS sig FROM sig".format(
            b=b, sig=" || '|' || ".join(f"h{b * 4 + r}" for r in range(4))
        )
        for b in range(4)
    )
    return f"""
    shm AS (SELECT doc, md5(shingle) AS h FROM sh),
    sig AS (SELECT doc, {_sql_rot_mins(16)} FROM shm GROUP BY doc),
    bands AS ({bands}),
    split AS (SELECT doc_id AS doc,
                     CASE WHEN CAST(('0x' || substring(
                              md5('inc:' || CAST(doc_id AS VARCHAR)), 1, 2))
                              AS INTEGER) < 128
                          THEN 1 ELSE 0 END AS in_corpus
              FROM documents),
    nb AS (SELECT b.doc, b.band, b.sig FROM bands b
           JOIN split ON split.doc = b.doc WHERE in_corpus = 0),
    cb AS (SELECT b.doc, b.band, b.sig FROM bands b
           JOIN split ON split.doc = b.doc WHERE in_corpus = 1)
    """


@query(
    "q133_incremental_dedup",
    f"""
    WITH ws AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
                FROM documents),
    sh AS (SELECT doc_id AS doc,
                  UNNEST(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                        FOR i IN range(1, len(w) - 1)])) AS shingle
           FROM ws),
    {_sql_inc_minhash()}
    SELECT nb.doc AS doc_new,
           CAST(COUNT(DISTINCT cb.doc) AS BIGINT) AS n_corpus_dups
    FROM nb JOIN cb ON nb.band = cb.band AND nb.sig = cb.sig
    GROUP BY nb.doc
    """,
)
def q133_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a fresh batch (md5-bucketed half of
    the corpus, standing in for today's crawl) is LSH-matched AGAINST
    the already-ingested half — never against itself, never corpus ×
    corpus. Returns each new doc's count of distinct corpus collisions.
    At 100 TB the corpus side's banded signatures are a persisted index
    written once at ingest; per-batch cost is |batch| + collision
    volume (operators/dedup.lsh_matches_between)."""
    from excel_to_database_spark.operators import dedup as D

    d = t(spark, sf_dir, "documents")
    in_corpus = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("inc:"), F.col("doc_id").cast("string"))), 1, 2
            ),
            16,
            10,
        ).cast("int")
        < 128
    )
    membership = d.select(F.col("doc_id").alias("doc"), in_corpus.alias("in_corpus"))
    # both the new-batch and corpus branches filter this frame — one
    # signature aggregation, not two
    from excel_to_database_spark.operators.caching import pin

    sig = pin(
        D.minhash_signatures(D.shingles(d, "doc_id", "text", 3), 16).join(
            membership, "doc"
        )
    )
    sig_new = sig.filter(~F.col("in_corpus")).drop("in_corpus")
    sig_corpus = sig.filter(F.col("in_corpus")).drop("in_corpus")
    return (
        D.lsh_matches_between(sig_new, sig_corpus, bands=4, rows=4)
        .groupBy(F.col("doc_new"))
        .agg(F.countDistinct("doc_corpus").alias("n_corpus_dups"))
    )


@query(
    "q137_stream_typed_state",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(value) AS max_value,
           CAST(epoch_us(MAX(ts)) AS BIGINT) AS last_ts_us
    FROM events GROUP BY user_id
    """,
)
def q137_stream_typed_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-state streaming fold — transformWithStateInPandas, active
    even without the protobuf distribution via the vendored minimal
    runtime (streaming/tws.ensure_protobuf; the byte-identical
    applyInPandasWithState twin remains as the fallback) — replaying
    the events table availableNow; the oracle is the equivalent batch
    aggregate — streaming/batch parity on a custom stateful operator,
    not a built-in agg. Each key's state row updates with
    order-independent folds only, so results are identical under any
    micro-batch slicing; the final per-user row is selected by max
    event count (monotone per key across emissions)."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )
    from excel_to_database_spark.streaming.tws import user_stats_auto

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_memory(
        spark, user_stats_auto(stream), "q137_tws", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_events", "max_value", F.col("last_ts_us"))
    )


@query(
    "q149_stream_typed_list_state",
    """
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_seen,
           list_slice(list(value ORDER BY value DESC), 1, 3) AS top_values
    FROM events GROUP BY user_id
    """,
)
def q149_stream_typed_list_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed LIST-state streaming fold: per-user running top-3 values
    through ``transformWithStateInPandas`` list state (ListStatePut /
    ListStateGet / iteration — the protocol family q137's value-state
    fold doesn't touch), replayed availableNow; the oracle is the batch
    top-3. top-k of a union is associative and order-independent, so
    micro-batch slicing cannot change the answer; the final per-user
    emission is selected by max n_seen (monotone per key)."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_topk_tws,
    )

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_memory(
        spark, user_topk_tws(stream, k=3), "q149_tws", output_mode="update"
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "n_seen", "top_values")
    )


@query(
    "q150_stream_typed_map_state",
    """
    SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id, event_type
    """,
)
def q150_stream_typed_map_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed MAP-state streaming fold: per-(user, event_type) running
    counts through ``transformWithStateInPandas`` map state
    (UpdateValue / GetValue / paginated KeyAndValuePair iteration —
    completes the value/list/map state-primitive trilogy q137/q149
    started), replayed availableNow; the oracle is the batch two-key
    group-by. Counts are additive and each emission carries the full
    map, so the final emission per pair — max count, monotone — is the
    complete answer."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_type_counts_tws,
    )

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = run_stream_to_memory(
        spark, user_type_counts_tws(stream), "q150_tws", output_mode="update"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(F.desc("n_events"))
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "n_events")
    )


#: q161 gap: 1 hour of event time
_Q161_GAP_MS = 3_600_000


@query(
    "q161_stream_event_time_sessions",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > CAST({_Q161_GAP_MS} AS BIGINT) * 1000
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ), sid AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id,
             MIN(ts_us) AS session_start_us,
             MAX(ts_us) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sid GROUP BY user_id, sid
    )
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM sess
    WHERE session_end_us // 1000 + {_Q161_GAP_MS}
          <= (SELECT MAX(ts_us) // 1000 FROM e)
    """,
)
def q161_stream_event_time_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME-timer gap sessionization through the typed-state
    surface (timeMode='EventTime' — the timer family q137/q149/q150's
    processing-time trilogy never exercises): per-user sessions split
    on >1h event-time gaps, each held open in LIST state until the
    WATERMARK passes its last event + gap, then emitted by the expiry
    handler. Replayed availableNow (one data batch + the timer-firing
    no-data batch), the emitted set is exactly the batch gap-sessions
    whose expiry the final watermark (max event ts, delay 0) reached —
    which is what the oracle computes, including the ms-floor and
    boundary-equality (timer fires at expiry == watermark, pinned by
    test) semantics. Sessions the watermark never closes are correctly
    absent from both sides."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_event_sessions_tws,
    )

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_memory(
        spark,
        user_event_sessions_tws(stream, gap_ms=_Q161_GAP_MS),
        "q161_tws",
        output_mode="append",
    ).select("user_id", "session_start_us", "session_end_us", "n_events")


@query(
    "q165_stream_event_time_sessions_fallback",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS ts_us FROM events
    ), flagged AS (
      SELECT user_id, ts_us,
             CASE WHEN lag(ts_us) OVER w IS NULL
                  OR ts_us - lag(ts_us) OVER w > CAST({_Q161_GAP_MS} AS BIGINT) * 1000
                  THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ), sid AS (
      SELECT user_id, ts_us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id,
             MIN(ts_us) AS session_start_us,
             MAX(ts_us) AS session_end_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM sid GROUP BY user_id, sid
    )
    SELECT user_id, session_start_us, session_end_us, n_events
    FROM sess
    WHERE session_end_us // 1000 + {_Q161_GAP_MS}
          < (SELECT MAX(ts_us) // 1000 FROM e)
    """,
)
def q165_stream_event_time_sessions_fallback(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q161's portable twin through ``applyInPandasWithState`` +
    GroupStateTimeout.EventTimeTimeout (no protobuf dependency): same
    gap-session semantics, same late-drop finality; the one contract
    difference is the firing boundary — GroupState timeouts fire only
    when the watermark advances STRICTLY beyond the registered
    timestamp (pinned empirically: an expiry equal to the final
    watermark stays open), so the oracle's emission filter is strict
    ``<`` where q161's is ``<=``."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )
    from excel_to_database_spark.streaming.tws import (
        user_event_sessions_applyinpandas,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return run_stream_to_memory(
        spark,
        user_event_sessions_applyinpandas(stream, gap_ms=_Q161_GAP_MS),
        "q165_aip",
        output_mode="append",
    ).select("user_id", "session_start_us", "session_end_us", "n_events")


# ---------------------------------------------------------------------------
# Round-13 widening: the four classic TPC-H shapes still absent from the
# inventory (Q2 correlated-min sourcing, Q11 global-scalar HAVING, Q16
# NOT-IN + COUNT DISTINCT matrix, Q20 nested two-level-aggregate semi-join).
# The synthetic schema has no partsupp table, so — exactly like q09's Q9
# adaptation — lineitem serves as the observed supply relation: a
# (part, supplier) pair exists iff that supplier shipped that part, and
# per-pair cost/volume are derived from the shipped lines with integer
# arithmetic (floored cents / floored units) so every comparison and every
# aggregate is engine-exact.
# ---------------------------------------------------------------------------


@query(
    "q195_min_cost_supplier",
    """
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(FLOOR((l_extendedprice * 100.0) / l_quantity) AS BIGINT))
                   AS unit_cents
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'),
    best AS (
        SELECT l_partkey, MIN(unit_cents) AS min_cents
        FROM supply JOIN eu ON l_suppkey = s_suppkey
        GROUP BY l_partkey)
    SELECT s_acctbal, s_name, n_name,
           p_partkey, p_name, unit_cents AS min_unit_cents
    FROM supply
    JOIN eu ON supply.l_suppkey = eu.s_suppkey
    JOIN best ON supply.l_partkey = best.l_partkey
            AND supply.unit_cents = best.min_cents
    JOIN part ON p_partkey = supply.l_partkey
    WHERE p_size <= 25 AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 50
    """,
)
def q195_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part within a region
    (correlated MIN subquery, decorrelated to an aggregate + equality
    join back — the plan Catalyst produces for the nested form anyway).
    Per-pair unit cost is floored integer cents (MIN over shipped
    lines), so the min and the cost-equality join are exact in both
    engines. The region-filtered supplier dimension (supplier ⋈ nation
    ⋈ region, all broadcast) is applied BEFORE both aggregates, so the
    per-part min ranges only over in-region suppliers; the part
    attribute filter prunes the final probe. Two shuffles total (pair
    agg, per-part min) and a top-50 with a unique tiebreaker chain —
    TakeOrderedAndProject, never a global sort."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 25) & (F.col("p_type") == "LARGE")
    )
    eu = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    supply = (
        l.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(
            F.min(
                F.floor(F.col("l_extendedprice") * F.lit(100.0) / F.col("l_quantity"))
            ).alias("unit_cents")
        )
    )
    best = supply.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cents").alias("min_cents")
    )
    return (
        supply.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cents") == F.col("min_cents")),
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("unit_cents").alias("min_unit_cents"),
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(50)
    )


@query(
    "q196_important_supply",
    """
    WITH val AS (
        SELECT l_partkey,
               SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)) AS BIGINT))
                   AS part_value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY l_partkey),
    tot AS (SELECT SUM(part_value) AS total_value FROM val)
    SELECT l_partkey AS partkey, part_value
    FROM val, tot
    WHERE part_value * 1200 > total_value
    """,
)
def q196_important_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part supply value within one region,
    HAVING-filtered against a fraction of the GLOBAL total (the
    uncorrelated-scalar-vs-group comparison). Per-line value is floored
    to integer dollars so both the per-part sums and the global total
    are exact bigints, and the fraction test is cross-multiplied
    (part_value * 1200 > total) — no float division anywhere. The
    global total is a 1-row aggregate broadcast back over the group
    rows (the established scalar-subquery pattern); one shuffle for the
    part rollup, map-side-combined."""
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        l.join(F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
            ).alias("part_value")
        )
    )
    tot = val.agg(F.sum("part_value").alias("total_value"))
    return (
        val.join(F.broadcast(tot))
        .filter(F.col("part_value") * 1200 > F.col("total_value"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


@query(
    "q197_supplier_part_matrix",
    """
    SELECT p_brand, p_type, CAST(p_size AS INT) AS p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%9')
    GROUP BY p_brand, p_type, p_size
    """,
)
def q197_supplier_part_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    over the observed supply pairs, with a negated attribute filter AND
    a NOT IN exclusion subquery (suppliers whose name ends in '9' stand
    in for Q16's complaint suppliers). The exclusion list is
    driver-small → broadcast LEFT ANTI join, never a shuffle; the
    part-attribute filters prune the broadcast dimension before the
    probe; the distinct-pair projection and the COUNT(DISTINCT) rollup
    are the only shuffles, both on already-reduced keys."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45))
    )
    bad = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%9"))
        .select("s_suppkey")
    )
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q198_excess_share_suppliers",
    """
    WITH pq AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS pair_qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%widget%'
          AND l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate < TIMESTAMP '1999-01-01'
        GROUP BY l_partkey, l_suppkey),
    ptot AS (
        SELECT l_partkey, SUM(pair_qty) AS part_qty
        FROM pq GROUP BY l_partkey)
    SELECT s_name, n_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM pq
    JOIN ptot ON pq.l_partkey = ptot.l_partkey
    JOIN supplier ON pq.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE pair_qty * 5 > part_qty * 2
    GROUP BY s_name, n_name
    """,
)
def q198_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested two-level-aggregate threshold —
    suppliers whose shipped volume of a part (name-pattern-filtered,
    one ship-year window) exceeds 40% of that part's total shipped
    volume, i.e. Q20's ps_availqty > ½·Σqty test re-expressed over the
    observed supply relation. Quantities floor to bigint and the share
    test cross-multiplies (pair·5 > total·2): exact in both engines.
    The per-pair rollup reuses its own partitioning for the per-part
    rollup (same leading key — no second wide shuffle); part and the
    dimension chain broadcast; the date window and the name pattern
    reach the parquet scans."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    pq = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.floor("l_quantity")).alias("pair_qty"))
    )
    ptot = pq.groupBy("l_partkey").agg(F.sum("pair_qty").alias("part_qty"))
    return (
        pq.join(ptot, "l_partkey")
        .filter(F.col("pair_qty") * 5 > F.col("part_qty") * 2)
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
