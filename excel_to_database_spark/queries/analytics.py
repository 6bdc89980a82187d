"""Behavioral / product-analytics queries over the ``events`` table
(ordered funnels, retention cohorts, gaps-and-islands, time-weighted
averages, OHLC bars) plus the CMS-backed heavy-hitters query.

The reference computes no event analytics (its only aggregations are
load-report row counts, ``app/data.py:122,148`` — SURVEY.md §2.3); this
family is extension surface, all expressed as built-in DataFrame ops
with DuckDB-exact oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from excel_to_database_spark.operators.funnel import (
    epoch_day,
    funnel_counts,
    islands,
    retention_matrix,
)
from excel_to_database_spark.queries.base import dsum, query, sql_dsum, t

_SQL_DAY = "CAST(FLOOR(EPOCH(ts) / 86400) AS BIGINT)"


def _sql_pagerank(iters: int) -> str:
    """Unrolled fixed-point PageRank CTE chain (see q122 docstring for
    why fixed-point: bigint div/mod is bit-identical across engines,
    float iteration is not)."""
    parts = [
        """
    raw AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                            's' || CAST(l_suppkey AS VARCHAR) AS b
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT a AS src, b AS dst FROM raw
              UNION ALL SELECT b AS src, a AS dst FROM raw),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    p0 AS (SELECT src AS node, CAST(1000000000000 // n AS BIGINT) AS rank
           FROM deg, nn)"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""
    c{i} AS (SELECT e.dst AS node, SUM(p.rank // d.deg) AS s
           FROM p{i - 1} p JOIN deg d ON d.src = p.node
           JOIN edges e ON e.src = p.node
           GROUP BY e.dst),
    p{i} AS (SELECT node,
                CAST((15 * (1000000000000 // n)) // 100 + (85 * s) // 100
                     AS BIGINT) AS rank
           FROM c{i}, nn)"""
        )
    return ",".join(parts)


@query(
    "q116_funnel_stages",
    """
    WITH s0 AS (SELECT user_id, MIN(ts) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s1 AS (SELECT e.user_id, MIN(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
           WHERE e.event_type = 'view' AND e.ts > s0.t0 GROUP BY e.user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY e.user_id)
    SELECT '0_signup' AS stage, COUNT(*) AS n_keys FROM s0
    UNION ALL SELECT '1_view', COUNT(*) FROM s1
    UNION ALL SELECT '2_click', COUNT(*) FROM s2
    UNION ALL SELECT '3_purchase', COUNT(*) FROM s3
    """,
)
def q116_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered 4-stage funnel (signup → view → click →
    purchase): stage *i+1* admits only events after the user's stage-*i*
    entry. Every join/agg in the chain hashes on ``user_id`` — one
    partitioning reused end-to-end, survivor side only shrinks."""
    e = t(spark, sf_dir, "events")
    return funnel_counts(
        e, "user_id", "ts", "event_type", ["signup", "view", "click", "purchase"]
    )


@query(
    "q117_retention_cohorts",
    f"""
    WITH fd AS (SELECT user_id,
                       CAST(FLOOR(MIN({_SQL_DAY}) / 7) AS BIGINT) AS cohort_period
                FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id,
                   CAST(FLOOR({_SQL_DAY} / 7) AS BIGINT) AS period
            FROM events)
    SELECT fd.cohort_period,
           act.period - fd.cohort_period AS period_offset,
           COUNT(*) AS n_keys
    FROM act JOIN fd USING (user_id)
    GROUP BY fd.cohort_period, period_offset
    """,
)
def q117_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by first-activity week,
    counted in each later week they are active. Epoch-day // 7 periods
    keep the bucketing timezone-free and engine-portable."""
    e = t(spark, sf_dir, "events")
    return retention_matrix(e, "user_id", "ts", period_days=7)


@query(
    "q118_gaps_islands",
    f"""
    WITH days AS (SELECT DISTINCT user_id, {_SQL_DAY} AS d FROM events),
    rn AS (SELECT user_id, d,
                  ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS r
           FROM days),
    isl AS (SELECT user_id, d - r AS grp, COUNT(*) AS run_days
            FROM rn GROUP BY user_id, d - r)
    SELECT user_id,
           COUNT(*) AS n_islands,
           MAX(run_days) AS longest_run,
           CAST(SUM(run_days) AS BIGINT) AS active_days
    FROM isl GROUP BY user_id
    """,
)
def q118_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-active-day runs per user via the day − row_number()
    islands trick: one per-key window + one agg, no self-join."""
    e = t(spark, sf_dir, "events")
    isl = islands(e, "user_id", "ts")
    return isl.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_days").alias("longest_run"),
        F.sum("run_days").cast("bigint").alias("active_days"),
    )


@query(
    "q119_heavy_hitters",
    """
    WITH seeds AS (SELECT UNNEST([0, 1, 2, 3]) AS seed),
    exploded AS (
        SELECT seed,
               CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 4096 AS bucket
        FROM lineitem, seeds
    ),
    sketch AS (SELECT seed, bucket, COUNT(*) AS cnt FROM exploded GROUP BY seed, bucket),
    stats AS (SELECT COUNT(*) * 1.5 / COUNT(DISTINCT l_partkey) AS thr FROM lineitem),
    keys AS (SELECT DISTINCT l_partkey AS item FROM lineitem),
    probe_buckets AS (
        SELECT item, seed,
               CAST(('0x' || substring(md5(CAST(item AS VARCHAR)), seed * 4 + 1, 4)) AS INTEGER) % 4096 AS bucket
        FROM keys, seeds
    ),
    est AS (SELECT item, CAST(MIN(COALESCE(cnt, 0)) AS BIGINT) AS cms_est
            FROM probe_buckets LEFT JOIN sketch USING (seed, bucket)
            GROUP BY item),
    cand AS (SELECT item, cms_est FROM est, stats WHERE cms_est >= thr),
    exact AS (SELECT l_partkey AS item, CAST(COUNT(*) AS BIGINT) AS exact_cnt
              FROM lineitem WHERE l_partkey IN (SELECT item FROM cand)
              GROUP BY l_partkey)
    SELECT cand.item, exact.exact_cnt, cand.cms_est,
           CAST(exact.exact_cnt >= stats.thr AS INT) AS is_true_heavy
    FROM cand JOIN exact USING (item), stats
    """,
)
def q119_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (frequency ≥ 1.5× the mean key frequency) via the
    count-min sketch: the sketch never undercounts, so filtering the
    key set on the CMS *estimate* yields a provable superset of the
    true heavies; exact counting then runs only over that candidate
    set (``is_true_heavy`` marks the survivors). At 100 TB the sketch
    is O(depth×width) and broadcasts; the expensive exact count is
    confined to the candidates instead of every distinct key. The md5
    hash family is engine-portable, so even the candidate set is
    oracle-exact."""
    from excel_to_database_spark.operators.sketch import cms_build, cms_estimate

    l = t(spark, sf_dir, "lineitem")
    sketch = cms_build(l, "l_partkey", depth=4, width=4096)
    est = cms_estimate(sketch, l, "l_partkey", depth=4, width=4096)
    stats = l.agg(
        (F.count(F.lit(1)) * 1.5 / F.countDistinct("l_partkey")).alias("thr")
    )
    cand = est.crossJoin(F.broadcast(stats)).filter(F.col("cms_est") >= F.col("thr"))
    exact = (
        l.join(F.broadcast(cand.select("item")), l.l_partkey == F.col("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    return cand.join(exact, "item").select(
        "item",
        "exact_cnt",
        "cms_est",
        (F.col("exact_cnt") >= F.col("thr")).cast("int").alias("is_true_heavy"),
    )


@query(
    "q120_time_weighted_avg",
    """
    WITH seq AS (
        SELECT user_id, value,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events)
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(12,2)) * ((nxt - us) // 1000)) AS DOUBLE)
             / CAST(SUM((nxt - us) // 1000) AS DOUBLE) AS twa,
           CAST(SUM(nxt - us) AS BIGINT) AS observed_us
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY user_id
    """,
)
def q120_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted mean of ``value`` per user: each reading is held
    until the next one, weighted by the hold duration in microseconds.
    One per-key window (lead) + one agg. The arithmetic is EXACT end
    to end, which is what makes the cross-engine hash match: the value
    is cast to decimal(12,2) (exact for 2-decimal readings — no
    rounding, hence no rounding-mode divergence), durations truncate to
    integer milliseconds, and their product/sum is exact decimal whose
    unscaled integer stays under 2^53 — above that DuckDB's
    decimal→double cast double-rounds (int128→double, then /10^scale)
    and the last ulp diverges from Spark's correctly-rounded
    BigDecimal cast. Casting the raw double product at scale 6 is also
    unsafe: products like 0.75 × 18024.43691 land exactly on a
    …xxx5e-6 tie, where Spark rounds half-up and DuckDB half-even."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires TIMESTAMP (rejects NTZ); the cast is
    # deterministic because every query pins session.timeZone=UTC
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = e.select(
        "user_id", "value", us.alias("us"), F.lead(us).over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    dt = F.col("nxt") - F.col("us")
    dt_ms = F.expr("(nxt - us) div 1000")
    return seq.groupBy("user_id").agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)") * dt_ms).cast("double")
            / F.sum(dt_ms).cast("double")
        ).alias("twa"),
        F.sum(dt).cast("bigint").alias("observed_us"),
    )


@query(
    "q121_ohlc_bars",
    f"""
    WITH ordered AS (
        SELECT event_type, {_SQL_DAY} AS bar_day, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, {_SQL_DAY}
                                  ORDER BY ts, event_id) AS ra,
               ROW_NUMBER() OVER (PARTITION BY event_type, {_SQL_DAY}
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM events)
    SELECT event_type, bar_day,
           MAX(CASE WHEN ra = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rd = 1 THEN value END) AS close,
           {sql_dsum('value', 'volume')},
           COUNT(*) AS n_events
    FROM ordered
    GROUP BY event_type, bar_day
    """,
)
def q121_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type. Spark side uses ``min_by`` /
    ``max_by`` on a (ts, event_id) struct — ordered-set aggregates that
    fold map-side in a single hash aggregation, no window pass (the
    oracle spells the same semantics with row_number windows)."""
    e = t(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return e.groupBy("event_type", epoch_day("ts").alias("bar_day")).agg(
        F.min_by("value", ordkey).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", ordkey).alias("close"),
        dsum("value", "volume"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q122_pagerank",
    f"""
    WITH {_sql_pagerank(5)}
    SELECT node, rank FROM p5 ORDER BY rank DESC, node LIMIT 20
    """,
)
def q122_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (5 iterations, damping 0.85) over the
    undirected customer–supplier co-trade graph, top-20 nodes.

    Ranks are bigint micro-units (total mass 10^12) and every step is
    integer ``div`` — contribution = rank div degree, damping =
    (85·Σ) div 100 — so the iteration is bit-identical in any engine:
    float PageRank cannot be oracle-checked exactly (per-iteration
    rounding diverges), fixed-point can, and the truncation error is
    ≤ degree per node per step, ~1e-9 of total mass.

    Scale shape: edges/degrees are built once and persisted
    (MEMORY_AND_DISK — at 100 TB this is the adjacency list you'd
    checkpoint); each of the 5 unrolled steps is contribution-join →
    dst-keyed sum, all hashed on the node key, the same plan GraphX's
    Pregel generates per superstep. The driver never sees a row."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # the whole iteration runs on LONG node ids (customer k → 2k,
    # supplier k → 2k+1): the per-superstep shuffles hash and move
    # 8-byte keys; the display ids ('c<k>'/'s<k>', what the oracle
    # states) are rebuilt only for the final 20-row ordered output
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
    w_deg = Window.partitionBy("src")
    # adjacency with the out-degree folded in (one window pass, no
    # second shuffle) — each superstep then needs a single src join
    # instead of ranks⋈deg followed by ⋈edges
    # pin (not a bare .persist): the registry is what lets the bench /
    # slope harnesses actually free the adjacency between runs — an
    # unregistered persist accumulated across runs and showed up as a
    # phantom 5.6x q122 slope in round 8 (storage-memory pressure on
    # the scaled run), re-measured at ~2.5x in isolation
    from excel_to_database_spark.operators.caching import pin

    # explicit repartition(P, src) BEFORE the window: the window alone
    # also hash-partitions on src, but AQE coalesces that exchange, and
    # a cache whose partition count no longer matches the supersteps'
    # requirement gets RE-EXCHANGED inside every superstep join (5
    # adjacency shuffles measured, the single largest per-rep cost).
    # AQE honors a user repartition with an explicit count, so the
    # cached partitioning satisfies each superstep join as-is; the
    # window then needs no exchange of its own.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_deg = pin(
        edges.repartition(n_shuffle, "src").withColumn(
            "deg", F.count(F.lit(1)).over(w_deg)
        )
    )
    deg = edges_deg.select("src", "deg").distinct()
    # pin: nn is broadcast into the rank update of EVERY superstep, and
    # its subtree contains the |E|-scan distinct — unpinned, each
    # superstep re-ran that full aggregation (6 cache scans measured)
    nn = pin(deg.agg(F.count(F.lit(1)).alias("n")))
    ranks = deg.crossJoin(F.broadcast(nn)).select(
        F.col("src").alias("node"),
        F.expr("1000000000000 div n").cast("bigint").alias("rank"),
    )
    for _ in range(5):
        contrib = (
            # hash build on the |nodes|-sized rank frame: sort-merge
            # would re-sort the full adjacency every superstep (the
            # persist retains partitioning, not ordering)
            ranks.hint("shuffle_hash").join(edges_deg, ranks.node == edges_deg.src)
            .select(F.col("dst").alias("node2"), F.expr("rank div deg").alias("share"))
            .groupBy("node2")
            .agg(F.sum("share").alias("s"))
        )
        ranks = contrib.crossJoin(F.broadcast(nn)).select(
            F.col("node2").alias("node"),
            (
                F.expr("(15 * (1000000000000 div n)) div 100")
                + F.expr("(85 * s) div 100")
            ).cast("bigint").alias("rank"),
        )
    # rebuild the display id BEFORE the ordered top-k: rank ties break
    # on the STRING id in the oracle ('c10' < 'c2' lexicographically),
    # so the sort key must be the display form
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("c"), (F.col("node") / 2).cast("bigint").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), ((F.col("node") - 1) / 2).cast("bigint").cast("string"))
    )
    return (
        ranks.select(label.alias("node"), "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(20)
    )


@query(
    "q124_mode_per_group",
    """
    WITH counts AS (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
                    FROM orders GROUP BY o_orderpriority, o_orderstatus),
    ranked AS (SELECT o_orderpriority, o_orderstatus, cnt,
                      ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                         ORDER BY cnt DESC, o_orderstatus) AS rn
               FROM counts),
    tot AS (SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS n_orders
            FROM counts GROUP BY o_orderpriority)
    SELECT r.o_orderpriority, r.o_orderstatus AS status_mode,
           r.cnt AS mode_cnt, tot.n_orders
    FROM ranked r JOIN tot USING (o_orderpriority)
    WHERE rn = 1
    """,
)
def q124_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent o_orderstatus per
    priority; ties broken by lowest status). Spark side is a single
    count-agg followed by ``min_by`` on a (−count, value) struct — an
    ordered-set aggregate that folds map-side, no window pass; the
    oracle spells the same semantics with a row_number window. A
    built-in ``mode()`` would be nondeterministic on ties in both
    engines, which is why the tiebreak is explicit."""
    o = t(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ordkey = F.struct(
        (-F.col("cnt")).alias("nc"), F.col("o_orderstatus").alias("s")
    )
    return counts.groupBy("o_orderpriority").agg(
        F.min_by("o_orderstatus", ordkey).alias("status_mode"),
        F.min_by("cnt", ordkey).alias("mode_cnt"),
        F.sum("cnt").cast("bigint").alias("n_orders"),
    )


def _sql_profile_col(c: str) -> str:
    return f"""
    SELECT '{c}' AS "column",
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(MIN({c}) AS VARCHAR) AS min_str,
           CAST(MAX({c}) AS VARCHAR) AS max_str
    FROM orders"""


@query(
    "q126_profile_orders",
    " UNION ALL ".join(
        _sql_profile_col(c)
        for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
                  "o_orderpriority"]
    ),
)
def q126_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of the orders table (null count,
    exact distinct count, min/max) — ONE aggregation job for every
    column at once (independent agg expressions share a single
    partial+final pass), unpivoted via ``stack``; the oracle spells it
    as per-column UNION ALL. At 100 TB the ``approx=True`` variant of
    the operator swaps exact countDistinct for HLL++ to keep the pass
    single-shuffle (see operators/profile.py)."""
    from excel_to_database_spark.operators.profile import profile

    o = t(spark, sf_dir, "orders")
    return profile(
        o,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"],
    )


@query(
    "q127_zscore_outliers",
    """
    WITH st AS (SELECT event_type,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
                       CAST(SUM(CAST(value AS DECIMAL(12,2))
                                * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
                FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           (e.value - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)) AS z
    FROM events e JOIN st USING (event_type)
    WHERE ABS((e.value - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1))) > 3.0
    """,
)
def q127_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outliers (|z| > 3 within each event type).
    Mean and stddev come from exact decimal power sums (2-decimal
    readings make the decimal casts lossless), so the per-row double
    arithmetic is bit-identical across engines; the 5-row stats frame
    broadcasts back onto the events scan — one agg + one map-side
    join, no window over the fact table."""
    e = t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    j = e.join(F.broadcast(st), "event_type")
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    )
    z = (F.col("value") - mean) / std
    return (
        j.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", "value", "z")
    )
