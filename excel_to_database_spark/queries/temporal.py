"""Temporal / event-stream queries over the ``events`` table: tumbling
windows, sessionization, range joins, and the as-of join operator
(SURVEY.md §2.4 range/as-of row and §2.9 windowing rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from excel_to_database_spark.operators.asof import asof_join
from excel_to_database_spark.operators.sessionize import sessionize
from excel_to_database_spark.queries.base import dsum, query, sql_dsum, t
from excel_to_database_spark.streaming.ingest import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts,
    windowed_counts,
)


@query(
    "q60_tumbling_window",
    f"""
    SELECT event_type,
           CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           COUNT(*) AS n_events,
           {sql_dsum('value', 'sum_value')}
    FROM events
    GROUP BY event_type, bucket_start
    """,
)
def q60_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute tumbling window aggregate. Batch form of the streaming
    ``F.window`` aggregation (streaming/ingest.py runs the same logic
    incrementally); bucket keyed by epoch so output is engine-portable."""
    e = t(spark, sf_dir, "events")
    bucket = (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("bigint").alias(
        "bucket_start"
    )
    return e.groupBy("event_type", bucket).agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", "sum_value")
    )


@query(
    "q61_sessionization",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )
    SELECT user_id,
           CAST(MAX(session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id
    """,
)
def q61_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30 min) via the sessionize operator."""
    e = t(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("bigint").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "q152_interval_overlap_join",
    """
    WITH iv AS (SELECT o_custkey AS k, o_orderkey AS id,
                       (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS s
                FROM orders)
    SELECT a.k AS o_custkey, a.id AS id_a, b.id AS id_b
    FROM iv a JOIN iv b ON a.k = b.k AND a.id < b.id
    WHERE a.s < b.s + 7 AND b.s < a.s + 7
    """,
)
def q152_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP self-join (operators/asof.interval_overlap_
    pairs): per customer, order pairs whose 7-day windows
    [orderdate, orderdate+7d) intersect. Candidates come from a
    (key, grid-bucket) equi-join — each interval touches ≤2 one-week
    cells — so pair volume scales with actual collisions; the oracle
    brute-forces the per-key theta join. Epoch-day arithmetic keeps
    both engines integer-exact."""
    o = t(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
        .cast("long")
        .alias("s"),
    ).withColumn("e", F.col("s") + 7)
    from excel_to_database_spark.operators.asof import interval_overlap_pairs

    return interval_overlap_pairs(
        iv, "o_custkey", "o_orderkey", "s", "e", bucket_width=7
    )


@query(
    "q62_range_self_join",
    """
    SELECT a.event_type,
           COUNT(*) AS n_followups
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
     AND a.event_id <> b.event_id
    GROUP BY a.event_type
    """,
)
def q62_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: equi key (user) + bounded time band. The
    equi conjunct keeps it a hash join with a residual range predicate —
    never a cartesian."""
    a = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"),
        F.col("event_id").alias("a_id"),
        F.col("event_type").alias("event_type"),
    )
    b = t(spark, sf_dir, "events").select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_id"),
    )
    return (
        a.join(
            b,
            (a.a_user == b.b_user)
            & (b.b_ts > a.a_ts)
            & (b.b_ts <= a.a_ts + F.expr("INTERVAL 5 MINUTES"))
            & (a.a_id != b.b_id),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_followups"))
    )


@query(
    "q65_stream_tumbling_window",
    """
    SELECT CAST(FLOOR(EPOCH(ts) / 600) * 600 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n_events
    FROM events
    GROUP BY bucket_start, event_type
    """,
)
def q65_stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming ingest of the events table (availableNow
    bounded replay) → watermarked 10-minute tumbling counts. The oracle
    is the equivalent *batch* SQL — streaming/batch parity is the
    correctness claim."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    counts = windowed_counts(stream, window="10 minutes", watermark="30 minutes")
    return run_stream_to_memory(spark, counts, "q65_tumbling", output_mode="complete")


@query(
    "q63_asof_join",
    """
    SELECT e.event_id,
           (SELECT o.o_orderkey FROM orders o
            WHERE o.o_custkey = e.user_id
              AND o.o_orderdate <= e.ts
            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
            LIMIT 1) AS last_orderkey
    FROM events e
    """,
)
def q63_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks the customer's most recent
    order at event time. Spark side is the union+window asof_join
    operator (operators/asof.py — one shuffle, no range explosion); the
    oracle states the same semantics as a correlated LIMIT 1 subquery."""
    e = t(spark, sf_dir, "events")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
    joined = asof_join(
        e.select("event_id", "user_id", "ts"),
        o,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey"],
        tiebreak="o_orderkey",
    )
    return joined.select("event_id", F.col("o_orderkey").alias("last_orderkey"))


@query(
    "q64_sliding_range_window",
    """
    SELECT event_id,
           user_id,
           COUNT(*) OVER (PARTITION BY user_id
                          ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                          RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)
               AS n_last_10min
    FROM events
    """,
)
def q64_sliding_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event sliding look-back (RANGE frame over epoch seconds):
    how many events this user produced in the trailing 10 minutes —
    the window-function form of a sliding stream aggregation."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_10min")
    )


@query(
    "q66_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def q66_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in F.session_window (30-min gap) in batch mode — the
    native form of the §2.9 'session windows' row (q61 is the
    hand-rolled equivalent). Oracle rebuilds sessions with the
    lag/cumsum construction at full µs precision (Spark merges at
    timestamp precision, so the oracle must not floor the gaps; the
    session *start* is floored only for output portability)."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


@query(
    "q143_stream_session_window",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) >= 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sid
        FROM flagged
    )
    SELECT user_id,
           CAST(FLOOR(EPOCH(MIN(ts))) AS BIGINT) AS session_start,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def q143_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING session windows (q66's incremental twin): availableNow
    replay of the events table through the watermarked
    ``F.session_window`` aggregation — sessions merge in the state
    store, the oracle rebuilds them with the same lag/cumsum
    construction as q66, so stream ≡ batch ≡ oracle is the correctness
    claim (the cross-trigger merge case is pinned separately in
    tests/test_streaming.py)."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    sessions = sessionized_counts(stream, gap="30 minutes", watermark="30 minutes")
    return run_stream_to_memory(
        spark, sessions, "q143_sessions", output_mode="complete"
    )


@query(
    "q67_sliding_window",
    """
    WITH buckets AS (
        SELECT event_type, value,
               CAST(FLOOR(FLOOR(EPOCH(ts)) / 300) * 300 AS BIGINT) AS w0
        FROM events
    ), contrib AS (
        SELECT event_type, value, w0 AS window_start FROM buckets
        UNION ALL
        SELECT event_type, value, w0 - 300 AS window_start FROM buckets
    )
    SELECT event_type, window_start, COUNT(*) AS n_events
    FROM contrib
    GROUP BY event_type, window_start
    """,
)
def q67_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (sliding) windows: 10-minute window, 5-minute slide —
    each event lands in exactly two windows. Spark's F.window handles
    the window explosion; the oracle states it as two shifted
    bucketings unioned."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "event_type",
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "n_events",
        )
    )


@query(
    "q68_asof_forward",
    """
    SELECT o.o_orderkey,
           (SELECT e.event_id FROM events e
            WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
            ORDER BY e.ts ASC, e.event_id ASC
            LIMIT 1) AS next_event_id
    FROM orders o
    WHERE o.o_custkey < 150
    """,
)
def q68_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each order picks the customer's next event at or
    after order time (asof_join direction='forward'); the tiebreak
    must be the SMALLEST event id at equal ts, mirrored by negating the
    tiebreak column (the operator keeps the greatest)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("neg_event_id", -F.col("event_id"))
    )
    joined = asof_join(
        o.select("o_orderkey", "o_custkey", "o_orderdate"),
        e,
        left_on="o_custkey",
        right_on="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        payload=["event_id"],
        tiebreak="neg_event_id",
        direction="forward",
    )
    return joined.select("o_orderkey", F.col("event_id").alias("next_event_id"))


@query(
    "q69_session_durations",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR FLOOR(EPOCH(ts)) - FLOOR(EPOCH(LAG(ts) OVER w)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    ), spans AS (
        SELECT user_id, session_id,
               CAST(FLOOR(EPOCH(MAX(ts))) - FLOOR(EPOCH(MIN(ts))) AS BIGINT)
                   AS duration_s,
               COUNT(*) AS n_events
        FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(duration_s) AS BIGINT) AS total_duration_s,
           MAX(n_events) AS max_session_events
    FROM spans GROUP BY user_id
    """,
)
def q69_session_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session spans: per-user total session duration and the busiest
    session, built on the sessionize operator."""
    e = t(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_seconds=1800, order_tiebreak="event_id")
    spans = s.groupBy("user_id", "session_id").agg(
        (F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("duration_s").cast("bigint").alias("total_duration_s"),
        F.max("n_events").alias("max_session_events"),
    )


@query(
    "q99_stream_stream_join",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q99_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join (click → purchase by the
    same user within one hour): both sides carry watermarks and the
    join condition carries the time bound, so state for each side is
    evicted once the watermark passes — the join runs in bounded state
    at any stream length. availableNow bounded replay; the oracle is
    the equivalent batch SQL join (stream ≡ batch parity)."""
    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("click_id", "purchase_id")
    return run_stream_to_memory(spark, joined, "q99_ss_join", output_mode="append")


@query(
    "q105_gapfill_rollup",
    f"""
    WITH actual AS (
        SELECT event_type,
               CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_dsum('value', 's')}
        FROM events GROUP BY event_type, bucket
    ),
    span AS (SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
             FROM actual GROUP BY event_type),
    grid AS (SELECT event_type, UNNEST(generate_series(lo, hi, 3600)) AS bucket
             FROM span)
    SELECT g.event_type, g.bucket,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events,
           CAST(COALESCE(a.s, 0) AS DOUBLE) AS sum_value
    FROM grid g LEFT JOIN actual a
      ON a.event_type = g.event_type AND a.bucket = g.bucket
    """,
)
def q105_gapfill_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous rollup with gap filling: hourly
    buckets per event type, with empty hours materialized as zero rows
    (the downsampling shape time-series stores call time_bucket_gapfill).
    The dense bucket grid comes from sequence+explode over each type's
    [min, max] span — generated, never collected; its size is bounded
    by the time span, not the event volume, so the left join back to
    the rolled-up actuals is a small-table join at any corpus scale."""
    e = t(spark, sf_dir, "events")
    b = (F.floor(F.unix_timestamp("ts") / 3600) * 3600).cast("bigint")
    actual = e.groupBy("event_type", b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "s")
    )
    span = actual.groupBy("event_type").agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = span.select(
        "event_type",
        F.explode(F.sequence(F.col("lo"), F.col("hi"), F.lit(3600))).alias("bucket"),
    )
    return grid.join(actual, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.col("s"), F.lit(0.0)).cast("double").alias("sum_value"),
    )


@query(
    "q108_asof_nearest",
    """
    SELECT o.o_orderkey,
           (SELECT e.event_id FROM events e
            WHERE e.user_id = o.o_custkey
            ORDER BY ABS(FLOOR(EPOCH(e.ts)) - FLOOR(EPOCH(o.o_orderdate))) ASC,
                     e.ts ASC, e.event_id ASC
            LIMIT 1) AS nearest_event_id
    FROM orders o
    WHERE o.o_custkey < 150
    """,
)
def q108_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of (minimum absolute time distance, ties to the
    earlier event then the smaller id) — composed from one backward and
    one forward as-of pass, then a per-row comparison. Still one
    union+window shuffle per direction, no range explosion; the oracle
    states the semantics as a correlated ORDER BY ABS(...) LIMIT 1."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150)
    e = (
        t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .withColumn("neg_event_id", -F.col("event_id"))
        .withColumn("ev_ts", F.col("ts"))
    )
    left = o.select("o_orderkey", "o_custkey", "o_orderdate")
    back = asof_join(
        left, e,
        left_on="o_custkey", right_on="user_id",
        left_ts="o_orderdate", right_ts="ts",
        payload=["event_id", "ev_ts"], tiebreak="neg_event_id",
        direction="backward",
    ).select(
        "o_orderkey", "o_orderdate",
        F.col("event_id").alias("b_id"), F.col("ev_ts").alias("b_ts"),
    )
    fwd = asof_join(
        left, e,
        left_on="o_custkey", right_on="user_id",
        left_ts="o_orderdate", right_ts="ts",
        payload=["event_id", "ev_ts"], tiebreak="neg_event_id",
        direction="forward",
    ).select(F.col("o_orderkey").alias("f_key"), F.col("event_id").alias("f_id"), F.col("ev_ts").alias("f_ts"))
    both = back.join(fwd, back.o_orderkey == fwd.f_key, "left")
    od = F.unix_timestamp("o_orderdate")
    diff_b = od - F.unix_timestamp("b_ts")
    diff_f = F.unix_timestamp("f_ts") - od
    pick_b = F.col("b_id").isNotNull() & (
        F.col("f_id").isNull() | (diff_b <= diff_f)
    )
    return both.select(
        "o_orderkey",
        F.when(pick_b, F.col("b_id")).otherwise(F.col("f_id")).alias("nearest_event_id"),
    )


@query(
    "q123_stream_static_enrich",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS n_purchases,
           {sql_dsum('value', 'sum_value')}
    FROM events JOIN customer ON user_id + 1 = c_custkey
    WHERE event_type = 'purchase'
    GROUP BY c_mktsegment
    """,
)
def q123_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the purchase stream joins the static
    customer dimension (broadcast per micro-batch — no stream-side
    state, no watermark needed for a static side) and aggregates per
    market segment. availableNow bounded replay; oracle = equivalent
    batch join (stream ≡ batch parity). At scale the static dim is
    re-broadcast per trigger, so dimension updates between batches are
    picked up — the classic streaming-enrichment shape."""
    from excel_to_database_spark.streaming.ingest import (
        read_events_stream,
        run_stream_to_memory,
    )

    ev = read_events_stream(spark, f"{sf_dir}/events.parquet")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.filter(F.col("event_type") == "purchase").join(
        F.broadcast(cust), F.col("user_id") + 1 == F.col("c_custkey")
    )
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_purchases"), dsum("value", "sum_value")
    )
    return run_stream_to_memory(
        spark, agg, "q123_enrich", output_mode="complete"
    ).select("c_mktsegment", "n_purchases", "sum_value")


@query(
    "q154_cumulative_distinct",
    """
    WITH fs AS (SELECT user_id,
                       MIN(CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT))
                           AS first_day
                FROM events GROUP BY user_id),
    newbie AS (SELECT first_day AS bucket_start, COUNT(*) AS n_new
               FROM fs GROUP BY first_day),
    days AS (SELECT DISTINCT CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT)
                    AS bucket_start FROM events)
    SELECT d.bucket_start,
           CAST(SUM(coalesce(n.n_new, 0)) OVER (ORDER BY d.bucket_start
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_exact,
           CAST(1 AS INT) AS approx_ok
    FROM days d LEFT JOIN newbie n ON n.bucket_start = d.bucket_start
    """,
)
def q154_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct-users curve from mergeable sketches
    (operators/rollup.cumulative_distinct): per-day HLL sketches
    union under an expanding window over |days| fixed-size rows —
    never an expanding rescan of raw events. Exactness is pinned the
    q144 way: the EXACT curve is computed by the first-seen-day trick
    (each user counts once, at their first day; the cumulative sum of
    first-seen counts IS the distinct total — SQL-able where
    COUNT(DISTINCT) over an expanding frame is not), and ``approx_ok``
    asserts the sketch estimate lands within 2% of it (HLL lgK=12
    standard error is ~1.6%); the oracle pins the flag at 1."""
    from excel_to_database_spark.operators.rollup import cumulative_distinct

    e = t(spark, sf_dir, "events")
    est = cumulative_distinct(e, "ts", "user_id", 86400)
    day = (
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
        .cast("bigint")
        .alias("bucket_start")
    )
    fs = e.groupBy("user_id").agg(F.min(day).alias("bucket_start"))
    newbie = fs.groupBy("bucket_start").agg(F.count(F.lit(1)).alias("n_new"))
    from pyspark.sql.window import Window

    w = Window.orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    exact = (
        est.select("bucket_start")
        .join(newbie, "bucket_start", "left")
        .select(
            "bucket_start",
            F.sum(F.coalesce(F.col("n_new"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("cum_exact"),
        )
    )
    return est.join(exact, "bucket_start").select(
        "bucket_start",
        "cum_exact",
        (
            F.abs(F.col("cum_distinct_est") - F.col("cum_exact"))
            <= F.lit(0.02) * F.col("cum_exact")
        )
        .cast("int")
        .alias("approx_ok"),
    )


@query(
    "q153_gapfill_locf",
    """
    WITH p AS (SELECT event_type,
                      CAST(FLOOR(EPOCH(ts) / 3600) * 3600 AS BIGINT) AS bucket_start,
                      COUNT(*) AS n_events,
                      CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value
               FROM events GROUP BY event_type, bucket_start),
    b AS (SELECT event_type, MIN(bucket_start) AS lo, MAX(bucket_start) AS hi
          FROM p GROUP BY event_type),
    g AS (SELECT b.event_type,
                 UNNEST(generate_series(lo, hi, 3600)) AS bucket_start
          FROM b)
    SELECT g.event_type, g.bucket_start,
           last_value(p.n_events IGNORE NULLS) OVER w AS n_events,
           last_value(p.sum_value IGNORE NULLS) OVER w AS sum_value,
           p.n_events IS NOT NULL AS is_observed
    FROM g LEFT JOIN p USING (event_type, bucket_start)
    WINDOW w AS (PARTITION BY g.event_type ORDER BY g.bucket_start
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q153_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill + LOCF (operators/rollup.gapfill_locf —
    the TimescaleDB time_bucket_gapfill/locf pattern): the hourly
    per-event-type series becomes dense between each key's own min and
    max hour, with counts and decimal-exact sums carried forward
    across the generated gaps and ``is_observed`` flagging fills. The
    oracle rebuilds the same dense grid with generate_series + an
    IGNORE NULLS running window."""
    from excel_to_database_spark.operators.rollup import gapfill_locf

    e = t(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
        .cast("bigint")
        .alias("bucket_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("sum_value"),
    )
    return gapfill_locf(
        hourly, ("event_type",), "bucket_start", ("n_events", "sum_value"), 3600
    )


@query(
    "q144_hypertable_rollup",
    """
    SELECT CAST(FLOOR(EPOCH(ts) / 86400) * 86400 AS BIGINT) AS bucket_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
           CAST(MIN(value) AS DOUBLE) AS min_value,
           CAST(MAX(value) AS DOUBLE) AS max_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(1 AS INT) AS approx_ok
    FROM events
    GROUP BY bucket_start, event_type
    """,
)
def q144_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate rollup: DAILY answers computed ONLY from
    mergeable HOURLY partials (operators/rollup.py) — counts and
    decimal sums re-summed, min/max folded, distinct users merged as
    DataSketches HLL unions — never by rescanning raw events. The
    oracle recomputes the day grain directly from raw: the additive
    measures must match EXACTLY (partial mergeability is lossless);
    the sketch estimate is checked with q28's tolerance-flag pattern
    (``approx_ok`` = estimate within 5% of exact), since DuckDB's HLL
    is a different sketch. ``exact_users`` comes from one raw pass,
    present only so the oracle can pin the flag."""
    from excel_to_database_spark.operators.rollup import (
        merge_partials,
        time_bucket_partials,
    )

    e = t(spark, sf_dir, "events")
    hourly = time_bucket_partials(e, bucket_seconds=3600)
    daily = merge_partials(hourly, bucket_seconds=86400)
    exact = e.groupBy(
        (F.floor(F.unix_timestamp("ts") / 86400) * 86400)
        .cast("bigint")
        .alias("bucket_start"),
        "event_type",
    ).agg(F.countDistinct("user_id").alias("exact_users"))
    return daily.join(exact, ["bucket_start", "event_type"]).select(
        "bucket_start",
        "event_type",
        "n_events",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("min_value").cast("double").alias("min_value"),
        F.col("max_value").cast("double").alias("max_value"),
        "exact_users",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        )
        .cast("int")
        .alias("approx_ok"),
    )


@query(
    "q214_event_gap_profile",
    """
    WITH o AS (SELECT event_type, epoch_us(ts) AS ts_us,
                      LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                              ORDER BY epoch_us(ts), event_id)
                          AS prev_us
               FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(prev_us) AS BIGINT) AS n_gaps,
           CAST(MAX(ts_us - prev_us) AS BIGINT) AS max_gap_us,
           CAST(SUM(ts_us - prev_us) AS BIGINT) AS sum_gap_us,
           CAST(SUM(ts_us - prev_us) AS DOUBLE) / COUNT(prev_us) AS mean_gap_us
    FROM o GROUP BY event_type
    """,
)
def q214_event_gap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival gap profile — the ingestion-health
    monitor a streaming pipeline runs per source/type (a max_gap spike
    means a producer stalled; mean_gap drift means volume shifted).
    The sequence step is the scale-interesting part: event_type is a
    LOW-CARDINALITY group, so the LAG comes from
    ``selection.group_shift`` (group_rank's skew-safe ranks + ONE
    balanced self-equi-join on (type, rank−1) — rank is unique within
    the group, so the join key is skew-free even when one type is 90%
    of the stream), never ``Window.partitionBy(event_type)`` on the
    data path. Gaps are integer microseconds (unix_micros ≡ DuckDB
    epoch_us), max/sum exact bigints, the mean one final double
    division."""
    from excel_to_database_spark.operators.selection import group_shift

    e = t(spark, sf_dir, "events").select(
        "event_type",
        # parquet timestamps are NTZ; the session TZ is UTC, so the
        # cast is the identity and unix_micros ≡ DuckDB epoch_us
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_id",
    )
    shifted = group_shift(
        e, "event_type", "ts_us", "event_id", ["ts_us"], offsets=(-1,)
    )
    gap = F.col("ts_us") - F.col("ts_us_lag1")
    return shifted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("ts_us_lag1").alias("n_gaps"),
        F.max(gap).cast("bigint").alias("max_gap_us"),
        F.sum(gap).cast("bigint").alias("sum_gap_us"),
        (F.sum(gap).cast("double") / F.count("ts_us_lag1")).alias("mean_gap_us"),
    )
