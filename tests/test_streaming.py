import pyspark.sql.functions as F
from pyspark.sql.window import Window

from excel_to_database_spark.streaming.ingest import (
    read_events_stream,
    run_stream_to_memory,
    sessionized_counts,
    stream_dedup,
    stream_sync,
    windowed_counts,
)


def test_stream_ingest_matches_batch_loader(spark, sf_dir):
    """read_events_stream ≡ the canonical batch loader queries/base.t,
    row for row on the same file — the ingest-level parity gate. Both
    paths must agree on the *instants* (epoch µs), whatever physical
    encoding the parquet uses (µs TIMESTAMP_NTZ today, legacy
    ns-as-long before); this is the test that catches a data-contract
    drift in either reader."""
    from excel_to_database_spark.queries.base import t

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(spark, stream, "t_stream_raw", "append")
    norm = lambda df: sorted(
        map(
            tuple,
            df.select(
                "event_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
                "user_id",
                "event_type",
                "value",
            ).collect(),
        )
    )
    assert norm(got) == norm(t(spark, sf_dir, "events"))


def test_stream_matches_batch(spark, sf_dir):
    """availableNow replay of the events file == batch aggregation
    (through the canonical batch loader, not a re-stated read)."""
    from excel_to_database_spark.queries.base import t

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        spark, windowed_counts(stream), "t_stream_counts", "complete"
    )
    batch = t(spark, sf_dir, "events").groupBy(
        (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("bigint").alias("bucket_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_stream_sessionization_matches_batch(spark, sf_dir, tmp_path):
    """Streaming F.session_window (30-min gap, watermarked, sessions
    merging ACROSS two micro-batches) == an independent batch
    lag/cumsum gap-session computation (the q66 oracle shape: new
    session iff gap >= 1800s) — stream ≡ batch for sessionization."""
    import shutil

    from pyspark.sql.window import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # split the events file by event_id parity into two files so
    # sessions span micro-batch boundaries
    src = tmp_path / "events_split"
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    half = F.pmod(F.col("event_id"), F.lit(2)) == 0
    events.filter(half).coalesce(1).write.parquet(str(src / "a"))
    events.filter(~half).coalesce(1).write.parquet(str(src / "b"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        # same NTZ→TIMESTAMP normalization as read_events_stream (the
        # session files were re-written above, so the loader's path
        # glob doesn't apply here)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    got = run_stream_to_memory(
        spark, sessionized_counts(stream), "t_stream_sessions", "complete"
    )

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) >= 1800),
            1,
        ).otherwise(0),
    )
    batch = (
        flagged.withColumn("sid", F.sum("is_new").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.unix_timestamp(F.min("ts")).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "n_events")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
    shutil.rmtree(src)


def test_read_events_stream_empty_dir_schema_fallback(spark, tmp_path):
    """The stream can start against a directory no producer has written
    to yet: the footer probe fails, the known events schema kicks in,
    and files landing later are picked up on the next run."""
    import shutil

    d = tmp_path / "events_pending"
    d.mkdir()
    stream = read_events_stream(spark, str(d))  # must not raise
    empty = run_stream_to_memory(spark, stream, "t_empty_events", "append")
    assert empty.count() == 0
    assert dict(empty.dtypes)["ts"] == "timestamp"
    # first file lands; a later availableNow run drains it
    shutil.copy("/root/testdata/sf0.001/events.parquet", d / "a.parquet")
    stream2 = read_events_stream(spark, str(d))
    got = run_stream_to_memory(spark, stream2, "t_late_events", "append")
    assert got.count() == spark.read.parquet(str(d / "a.parquet")).count()


def test_stream_dedup(spark, sf_dir, tmp_path):
    """Duplicated input files → dropDuplicatesWithinWatermark removes
    re-deliveries."""
    import shutil

    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "events_dup"
    d.mkdir()
    shutil.copy(src, d / "a.parquet")
    shutil.copy(src, d / "b.parquet")
    stream = read_events_stream(spark, str(d))
    deduped = run_stream_to_memory(
        spark, stream_dedup(stream), "t_stream_dedup", "append"
    )
    n_unique = spark.read.parquet(src).count()
    assert deduped.count() == n_unique


def test_stream_sync_foreachbatch(spark, sf_dir, tmp_path):
    """Streaming sheet→table sync lands rows in the catalog through the
    same Destination policy as batch."""
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet").select(
        F.col("event_id").cast("string").alias("event_id"),
        F.col("event_type"),
    )
    q = stream_sync(
        stream, "events_synced", path="streamtest", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    n = spark.table("x_excel_streamtest.events_synced").count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()


def test_stateful_running_stats(spark, sf_dir):
    """applyInPandasWithState totals == batch groupBy aggregation
    (single availableNow batch drains the whole file)."""
    from excel_to_database_spark.streaming.stateful import running_user_stats

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    got = run_stream_to_memory(
        spark, running_user_stats(stream), "t_stateful", "update"
    )
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    g = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in got.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    assert g == b


def test_stream_upsert_merges_each_batch(spark, tmp_path):
    """Streaming CDC-apply: micro-batches of keyed updates merge into
    the target table — matched keys update (highest seq wins inside a
    batch), unmatched keys insert, untouched keys survive."""
    import time

    from excel_to_database_spark.streaming.ingest import stream_upsert

    spark.sql("DROP TABLE IF EXISTS t_stream_upsert")
    spark.createDataFrame(
        [(1, "one", 0), (2, "two", 0), (3, "three", 0)], "k long, v string, seq long"
    ).write.saveAsTable("t_stream_upsert")

    src = tmp_path / "updates"
    src.mkdir()
    # batch A: update k=1
    spark.createDataFrame([(1, "ONE", 10)], "k long, v string, seq long") \
        .coalesce(1).write.mode("overwrite").parquet(str(src / "a"))
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    # batch B: update k=2, two versions of k=4 (seq decides), insert k=5
    spark.createDataFrame(
        [(2, "TWO", 20), (4, "four-old", 1), (4, "four-new", 2), (5, "five", 5)],
        "k long, v string, seq long",
    ).coalesce(1).write.mode("overwrite").parquet(str(src / "b"))

    stream = (
        spark.readStream.schema("k long, v string, seq long")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_upsert(
        stream, "t_stream_upsert", "k", "seq",
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    got = {r["k"]: (r["v"], r["seq"]) for r in spark.table("t_stream_upsert").collect()}
    assert got == {
        1: ("ONE", 10),
        2: ("TWO", 20),
        3: ("three", 0),
        4: ("four-new", 2),
        5: ("five", 5),
    }
    spark.sql("DROP TABLE IF EXISTS t_stream_upsert")


def test_stream_rollup_matches_batch(spark, sf_dir, tmp_path):
    """The continuously-maintained partial table (two micro-batches,
    same hours split across both) merged to daily equals the batch
    rollup of raw data — additive measures exactly, HLL estimates
    identically (sketch unions are order-insensitive)."""
    from excel_to_database_spark.operators.rollup import (
        merge_partials,
        time_bucket_partials,
    )
    from excel_to_database_spark.streaming.ingest import stream_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tmp_path / "ev_split"
    half = F.pmod(F.col("event_id"), F.lit(2)) == 0
    events.filter(half).coalesce(1).write.parquet(str(src / "a"))
    events.filter(~half).coalesce(1).write.parquet(str(src / "b"))

    spark.sql("DROP TABLE IF EXISTS t_stream_rollup")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = stream_rollup(stream, "t_stream_rollup", checkpoint=str(tmp_path / "ck_ru"))
    q.awaitTermination()

    got_daily = merge_partials(
        spark.table("t_stream_rollup").drop("__batch_id"), 86400
    )
    want_daily = merge_partials(
        time_bucket_partials(
            events.withColumn("ts", F.col("ts").cast("timestamp"))
        ),
        86400,
    )
    key = lambda r: (r["bucket_start"], r["event_type"])
    val = lambda r: (r["n_events"], r["sum_value"], r["min_value"],
                     r["max_value"], r["approx_distinct"])
    a = {key(r): val(r) for r in got_daily.collect()}
    b = {key(r): val(r) for r in want_daily.collect()}
    assert a == b
    spark.sql("DROP TABLE IF EXISTS t_stream_rollup")


def test_stream_rollup_inline_compaction(spark, sf_dir, tmp_path):
    """stream_rollup(compact_every=2): the maintenance job runs inside
    the sink every 2nd micro-batch, collapsing buckets behind the
    ingest frontier to daily rows — daily answers match the
    uncompacted batch rollup exactly, and the old region really is
    compacted (daily-aligned rows with __batch_id=-1 present)."""
    from excel_to_database_spark.operators.rollup import (
        merge_partials,
        time_bucket_partials,
    )
    from excel_to_database_spark.streaming.ingest import stream_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "ev_maint"
    third = F.pmod(F.col("event_id"), F.lit(3))
    for i in range(3):
        events.filter(third == i).coalesce(1).write.parquet(str(src / f"p{i}"))

    spark.sql("DROP TABLE IF EXISTS t_maint_rollup")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_rollup(
        stream, "t_maint_rollup", checkpoint=str(tmp_path / "ck_maint"),
        compact_every=2, keep_recent_seconds=86400,
    )
    q.awaitTermination()

    got = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["approx_distinct"])
        for r in merge_partials(
            spark.table("t_maint_rollup").drop("__batch_id"), 86400
        ).collect()
    }
    want = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["approx_distinct"])
        for r in merge_partials(time_bucket_partials(events), 86400).collect()
    }
    assert got == want
    assert (
        spark.table("t_maint_rollup").filter(F.col("__batch_id") == -1).count() > 0
    )
    spark.sql("DROP TABLE IF EXISTS t_maint_rollup")


def test_stream_rollup_compaction_spares_inflight_batch(spark, sf_dir, tmp_path):
    """Exactly-once under crash-replay: a LATE event (bucketed far
    behind the retention horizon) arriving in the same micro-batch
    that triggers inline compaction must NOT be folded into the
    __batch_id=-1 region — its commit is not durable yet, and a replay
    of that batch re-runs the dynamic partition overwrite. The late
    bucket must stay under its own batch id, and re-writing the
    batch's partials (the replay) must leave merged answers
    unchanged."""
    import time as _time

    from excel_to_database_spark.operators.rollup import (
        merge_partials,
        time_bucket_partials,
    )
    from excel_to_database_spark.streaming.ingest import (
        _write_batch_keyed,
        stream_rollup,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    late = events.limit(1).select(
        F.lit(999999).cast("long").alias("event_id"),
        F.lit("2023-06-01 00:30:00").cast("timestamp").alias("ts"),
        F.lit(1).cast("long").alias("user_id"),
        F.lit("late_type").alias("event_type"),
        F.lit(2.5).alias("value"),
        F.lit("{}").alias("props"),
    )
    src = tmp_path / "ev_late"
    half = F.pmod(F.col("event_id"), F.lit(2)) == 0
    events.filter(half).coalesce(1).write.parquet(str(src / "p0"))
    _time.sleep(1.2)  # distinct mtimes pin micro-batch order
    events.filter(~half).unionByName(late).coalesce(1).write.parquet(
        str(src / "p1")
    )

    spark.sql("DROP TABLE IF EXISTS t_late_rollup")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_rollup(
        stream, "t_late_rollup", checkpoint=str(tmp_path / "ck_late"),
        compact_every=1, keep_recent_seconds=3600,
    )
    q.awaitTermination()

    all_events = events.unionByName(late)
    late_bucket = 1685579400 - (1685579400 % 3600)  # 2023-06-01 00:00 UTC
    tbl = spark.table("t_late_rollup")
    late_rows = tbl.filter(F.col("bucket_start") == late_bucket).collect()
    assert late_rows and all(r["__batch_id"] == 1 for r in late_rows)

    def merged():
        return {
            (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in merge_partials(
                spark.table("t_late_rollup").drop("__batch_id"), 86400
            ).collect()
        }

    want = {
        (r["bucket_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in merge_partials(time_bucket_partials(all_events), 86400).collect()
    }
    assert merged() == want

    # crash-replay of the compacting batch: identical partition
    # overwrite → answers unchanged (no double count)
    replay = time_bucket_partials(
        events.filter(~half).unionByName(late)
    ).withColumn("__batch_id", F.lit(1))
    _write_batch_keyed(replay, "t_late_rollup")
    assert merged() == want
    spark.sql("DROP TABLE IF EXISTS t_late_rollup")


def test_stream_dedup_clusters_matches_batch(spark, sf_dir, tmp_path):
    """Two micro-batches of documents through stream_dedup_clusters
    must yield EXACTLY the labels a from-scratch batch
    connected_components over the full corpus's LSH collision graph
    produces — the incremental canon-forest maintenance is
    semantics-free."""
    import time as _time

    from excel_to_database_spark.operators import dedup as D
    from excel_to_database_spark.streaming.ingest import stream_dedup_clusters

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = tmp_path / "docs_split"
    half = F.pmod(F.col("doc_id"), F.lit(2)) == 0
    docs.filter(half).coalesce(1).write.parquet(str(src / "p0"))
    _time.sleep(1.2)  # distinct mtimes pin micro-batch order
    docs.filter(~half).coalesce(1).write.parquet(str(src / "p1"))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_dedup_clusters(
        stream,
        index_path=str(tmp_path / "band_idx"),
        labels_path=str(tmp_path / "labels"),
        checkpoint=str(tmp_path / "ck_cl"),
    )
    q.awaitTermination()

    got = {
        r["doc"]: r["cluster"]
        for r in D.dedup_cluster_labels(spark, str(tmp_path / "labels")).collect()
    }
    # batch reference: CC over the SAME collision graph built from
    # scratch on the full corpus
    sig = D.minhash_signatures(D.shingles(docs, "doc_id", "text", 3), 16)
    want = {
        r["doc"]: r["cluster"]
        for r in D.connected_components(D.lsh_candidates(sig, 4, 4)).collect()
    }
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert set(got) == all_ids  # every doc labeled
    for d in all_ids:
        assert got[d] == want.get(d, d)  # CC label, or singleton self


def test_compact_partials_preserves_answers_and_retention(spark, sf_dir, tmp_path):
    """Hypertable maintenance: after N micro-batches the hourly partial
    table compacts (old buckets → daily rows, __batch_id = -1) with
    bit-identical merge_partials answers — including the HLL distinct
    estimate — at fewer rows; a second compaction with drop_before
    applies retention, removing expired buckets from answers."""
    from excel_to_database_spark.operators.rollup import (
        compact_partials,
        merge_partials,
    )
    from excel_to_database_spark.streaming.ingest import stream_rollup

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = tmp_path / "ev_parts"
    third = F.pmod(F.col("event_id"), F.lit(3))
    for i in range(3):  # three micro-batches
        events.filter(third == i).coalesce(1).write.parquet(str(src / f"p{i}"))

    spark.sql("DROP TABLE IF EXISTS t_compact_rollup")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = stream_rollup(stream, "t_compact_rollup", checkpoint=str(tmp_path / "ck_cp"))
    q.awaitTermination()

    buckets = sorted(
        r["bucket_start"]
        for r in spark.table("t_compact_rollup").select("bucket_start").distinct().collect()
    )
    cutoff = buckets[len(buckets) * 2 // 3]  # compact the older two thirds

    def snapshot():
        return {
            (r["bucket_start"], r["event_type"]): (
                r["n_events"], r["sum_value"], r["min_value"],
                r["max_value"], r["approx_distinct"],
            )
            for r in merge_partials(
                spark.table("t_compact_rollup").drop("__batch_id"), 86400
            ).collect()
        }

    before = snapshot()
    n_before = spark.table("t_compact_rollup").count()
    compact_partials(spark, "t_compact_rollup", before_bucket=cutoff)
    n_after = spark.table("t_compact_rollup").count()
    assert snapshot() == before  # answers unchanged, bit for bit
    assert n_after < n_before  # rows actually collapsed
    # compacted rows are marked, never colliding with a real batch id
    assert (
        spark.table("t_compact_rollup")
        .filter((F.col("bucket_start") < cutoff) & (F.col("__batch_id") != -1))
        .count()
        == 0
    )

    # retention: drop everything before the first daily boundary above
    # the minimum bucket — those buckets disappear from answers
    drop_at = (buckets[0] // 86400 + 1) * 86400
    compact_partials(
        spark, "t_compact_rollup", before_bucket=cutoff, drop_before=drop_at
    )
    kept = snapshot()
    assert set(kept) == {k for k in before if k[0] >= drop_at // 86400 * 86400}
    spark.sql("DROP TABLE IF EXISTS t_compact_rollup")


def test_stream_ann_probe_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched ANN probing of a persisted IVF index emits the
    same top-k corpus neighbors as a batch probe of the same index,
    with the new vectors delivered across two triggers — the vector
    twin of the streaming LSH dedup."""
    from excel_to_database_spark.operators import similarity as S
    from excel_to_database_spark.streaming.ingest import stream_ann_probe

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)

    cents, assigned = S.ivf_assign(corpus, "vec_id", "embedding", n_lists=8)
    q = new.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    expect = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], round(r["cosine"], 9))
        for r in S.ivf_probe_index(q, cents, assigned, k=3, n_probe=3).collect()
    }

    src = tmp_path / "new_vecs"
    half = F.pmod(F.col("vec_id"), F.lit(8)) == 0
    new.filter(half).coalesce(1).write.parquet(str(src / "a"))
    new.filter(~half).coalesce(1).write.parquet(str(src / "b"))
    spark.sql("DROP TABLE IF EXISTS t_stream_ann")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    qr = stream_ann_probe(
        stream, cents, assigned, "t_stream_ann",
        k=3, n_probe=3, checkpoint=str(tmp_path / "ckpt_ann"),
    )
    qr.awaitTermination()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], round(r["cosine"], 9))
        for r in spark.table("t_stream_ann").collect()
    }
    assert got == expect
    spark.sql("DROP TABLE IF EXISTS t_stream_ann")


def test_typed_list_state_across_triggers(spark, sf_dir, tmp_path):
    """Typed LIST state must survive micro-batch boundaries: with the
    events split across two triggers, the second batch's processor
    reads the first batch's top-k back through the state-server
    protocol (ListStateGet on non-empty state — unreachable in a
    single-trigger replay) and the final per-user top-3 equals the
    batch answer."""
    from excel_to_database_spark.streaming.ingest import run_stream_to_memory
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_topk_tws,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "ev_tws"
    half = F.pmod(F.col("event_id"), F.lit(2)) == 0
    events.filter(half).coalesce(1).write.parquet(str(src / "a"))
    events.filter(~half).coalesce(1).write.parquet(str(src / "b"))

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = run_stream_to_memory(
        spark, user_topk_tws(stream, k=3), "t_tws_topk", output_mode="update"
    )
    final = {
        r["user_id"]: (r["n_seen"], [round(v, 9) for v in r["top_values"]])
        for r in out.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("n_seen"))
            ),
        )
        .filter(F.col("__rn") == 1)
        .collect()
    }
    expect = {
        r["user_id"]: (r["n"], [round(v, 9) for v in r["top"]])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.slice(F.sort_array(F.collect_list("value"), asc=False), 1, 3).alias("top"),
        )
        .collect()
    }
    assert final == expect
    # two triggers actually ran (memory sink saw ≥2 emissions per user)
    assert out.count() > len(expect)


def test_typed_map_state_across_triggers(spark, sf_dir, tmp_path):
    """Typed MAP state across micro-batches: the second batch must
    read back and increment the first batch's per-type counters
    (GetValue on existing keys + full-map iteration through the
    protocol), converging on the batch (user, type) counts."""
    from excel_to_database_spark.streaming.ingest import run_stream_to_memory
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_type_counts_tws,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "ev_tws_map"
    half = F.pmod(F.col("event_id"), F.lit(2)) == 0
    events.filter(half).coalesce(1).write.parquet(str(src / "a"))
    events.filter(~half).coalesce(1).write.parquet(str(src / "b"))

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    out = run_stream_to_memory(
        spark, user_type_counts_tws(stream), "t_tws_map", output_mode="update"
    )
    final = {
        (r["user_id"], r["event_type"]): r["n_events"]
        for r in out.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("user_id", "event_type").orderBy(
                    F.desc("n_events")
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .collect()
    }
    expect = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in events.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert final == expect


def test_typed_state_timers_fire_across_triggers(spark, sf_dir, tmp_path):
    """Processing-time TIMERS through the typed-state protocol: timers
    registered during batch 1 (expiry = now+1ms) must be delivered at
    the start of batch 2, where the expiry handler emits a 'timer'
    marker and evicts the key's state — so every user present in the
    FIRST file gets exactly the timer treatment, and data rows exist
    for every user. Firing wall-times are not asserted (not
    deterministic); which keys fire by when is."""
    import time

    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_timer_markers_tws,
    )

    events = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    src = tmp_path / "ev_tws_timer"
    first_users = F.col("user_id") < 8
    events.filter(first_users).coalesce(1).write.parquet(str(src / "a"))
    events.filter(~first_users).coalesce(1).write.parquet(str(src / "b"))

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    # timers keep the query scheduling empty expiry-check batches, so
    # availableNow never self-terminates: poll until every user's timer
    # has fired, then stop explicitly
    q = (
        user_timer_markers_tws(stream)
        .writeStream.format("memory")
        .queryName("t_tws_timer")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    all_users = {r["user_id"] for r in events.select("user_id").distinct().collect()}
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            fired = {
                r["user_id"]
                for r in spark.table("t_tws_timer")
                .filter(F.col("kind") == "timer")
                .collect()
            }
            if fired == all_users:
                break
            time.sleep(2)
    finally:
        q.stop()
    out = spark.table("t_tws_timer").collect()
    data_users = {r["user_id"] for r in out if r["kind"] == "data"}
    timer_users = {r["user_id"] for r in out if r["kind"] == "timer"}
    assert data_users == all_users
    assert timer_users == all_users  # every registration eventually fired
    # each fired marker carries that key's pre-eviction count; a key
    # fires once per registration, and the count is the total at the
    # last data batch that touched the key
    last_count = {}
    for r in out:
        if r["kind"] == "timer":
            last_count[r["user_id"]] = max(
                last_count.get(r["user_id"], 0), r["n"]
            )
    expect = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert last_count == expect


def test_stream_ann_pq_probe_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched ANN probing of the persisted IVF-PQ index — the
    compressed-index streaming path — emits the same top-k as a batch
    probe of the same index, across two triggers."""
    from excel_to_database_spark.operators import similarity as S
    from excel_to_database_spark.streaming.ingest import stream_ann_pq_probe

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") % 4 != 0)
    new = emb.filter(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "pq_idx")
    S.build_ivf_pq_index(corpus, "vec_id", "embedding", path,
                         n_lists=8, m=8, pq_k=16)
    idx = S.load_ivf_pq_index(spark, path)
    q = new.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    expect = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], round(r["cosine"], 9))
        for r in S.ann_ivf_pq_probe(
            idx, k=3, n_probe=3, rerank=10, queries=q
        ).collect()
    }

    src = tmp_path / "new_pq_vecs"
    half = F.pmod(F.col("vec_id"), F.lit(8)) == 0
    new.filter(half).coalesce(1).write.parquet(str(src / "a"))
    new.filter(~half).coalesce(1).write.parquet(str(src / "b"))
    spark.sql("DROP TABLE IF EXISTS t_stream_ann_pq")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    qr = stream_ann_pq_probe(
        stream, path, "t_stream_ann_pq",
        k=3, n_probe=3, rerank=10, checkpoint=str(tmp_path / "ckpt_ann_pq"),
    )
    qr.awaitTermination()
    got = {
        (r["query_id"], r["neighbor_id"]): (r["rank"], round(r["cosine"], 9))
        for r in spark.table("t_stream_ann_pq").collect()
    }
    assert got == expect
    spark.sql("DROP TABLE IF EXISTS t_stream_ann_pq")


def test_stream_lsh_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Micro-batched LSH dedup against a persisted corpus index emits
    the same per-doc collision counts as the batch incremental dedup —
    with the new half delivered across two triggers."""
    from excel_to_database_spark.operators import dedup as D
    from excel_to_database_spark.streaming.ingest import stream_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
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
    corpus = docs.filter(in_corpus)
    new = docs.filter(~in_corpus)

    sig_c = D.minhash_signatures(D.shingles(corpus, "doc_id", "text", 3), 16)
    index = D.band_index(sig_c, 4, 4)

    # batch expectation through the same index
    sig_n = D.minhash_signatures(D.shingles(new, "doc_id", "text", 3), 16)
    expect = {
        r["doc_new"]: r["n"]
        for r in D.lsh_matches_against_index(sig_n, index, 4, 4)
        .groupBy("doc_new")
        .agg(F.countDistinct("doc_corpus").alias("n"))
        .collect()
    }

    # stream the new half in two files -> two micro-batches
    src = tmp_path / "new_docs"
    half = F.pmod(F.col("doc_id"), F.lit(2)) == 0
    new.filter(half).coalesce(1).write.parquet(str(src / "a"))
    new.filter(~half).coalesce(1).write.parquet(str(src / "b"))
    spark.sql("DROP TABLE IF EXISTS t_stream_lsh")
    stream = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_lsh_dedup(
        stream, index, "t_stream_lsh", checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = {
        r["doc_new"]: r["n_corpus_dups"]
        for r in spark.table("t_stream_lsh").collect()
    }
    assert got == expect

    # re-delivery: a second run from a FRESH checkpoint re-delivers the
    # same files as the same batch ids — the batch-keyed dynamic
    # partition overwrite must replace, not duplicate
    n_rows = spark.table("t_stream_lsh").count()
    stream2 = (
        spark.readStream.schema(new.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q2 = stream_lsh_dedup(
        stream2, index, "t_stream_lsh", checkpoint=str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    # the overwrite replaced files; invalidate THIS session's listing
    # cache (the sink can only refresh its own cloned micro-batch session)
    spark.catalog.refreshTable("t_stream_lsh")
    assert spark.table("t_stream_lsh").count() == n_rows
    got2 = {
        r["doc_new"]: r["n_corpus_dups"]
        for r in spark.table("t_stream_lsh").collect()
    }
    assert got2 == expect
    spark.sql("DROP TABLE IF EXISTS t_stream_lsh")


def test_typed_state_event_time_sessions(spark, tmp_path):
    """EVENT-TIME timers through the typed-state protocol: a session's
    expiry timer must fire only when the WATERMARK passes last-event +
    gap — never on wall-clock. Two triggers: batch 1 opens user 1's
    session (events at 0s and 5s → timer armed at 15s; watermark after
    the batch is 5s, so nothing fires). Batch 2 carries a late-ish
    user-1 event at 8s — above the 5s watermark, so it must REOPEN the
    session and re-arm the timer to 18s — plus a user-2 event at 60s
    that drives the watermark past 18s. The no-data batch after the
    source drains then fires user 1's timer: exactly ONE session row
    (0s..8s, n=3). A timer firing on wall-clock or on the stale 15s
    registration would split user 1 into two sessions; user 2's
    session (expiry 70s > final watermark 60s) must stay open and emit
    nothing."""
    from excel_to_database_spark.streaming.tws import (
        ship_protobuf_to_workers,
        user_event_sessions_tws,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string"
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))

    src = tmp_path / "ev_tws_sess"
    ev([(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:05")]).coalesce(
        1
    ).write.parquet(str(src / "a"))
    ev([(1, "2024-01-01 00:00:08"), (2, "2024-01-01 00:01:00")]).coalesce(
        1
    ).write.parquet(str(src / "b"))

    ship_protobuf_to_workers(spark)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        user_event_sessions_tws(stream, gap_ms=10_000)
        .writeStream.format("memory")
        .queryName("t_tws_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("t_tws_sessions").collect()
    base_us = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
    assert [
        (r["user_id"], r["session_start_us"] - base_us,
         r["session_end_us"] - base_us, r["n_events"])
        for r in out
    ] == [(1, 0, 8_000_000, 3)]
    spark.sql("DROP TABLE IF EXISTS t_tws_sessions")


def test_typed_state_event_time_boundary_fires_at_equality(spark, tmp_path):
    """Pin the timer-firing boundary the q161 oracle encodes: a timer
    whose expiry EQUALS the final watermark fires (<= semantics).
    User 1's session expires at exactly 00:00:10.000; user 2's lone
    event drives the watermark to exactly that instant."""
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
    src = tmp_path / "ev_tws_bnd"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:10")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts")).coalesce(
        1
    ).write.parquet(str(src / "a"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        user_event_sessions_tws(stream, gap_ms=10_000)
        .writeStream.format("memory")
        .queryName("t_tws_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [(r["user_id"], r["n_events"])
           for r in spark.table("t_tws_boundary").collect()]
    assert got == [(1, 1)]
    spark.sql("DROP TABLE IF EXISTS t_tws_boundary")


def test_typed_state_event_time_late_drop_and_delay(spark, tmp_path):
    """Lateness semantics: with delay 0, an event BELOW the watermark
    is dropped by the event-time operator (it must not resurrect or
    corrupt a closed session), while a nonzero ``delay`` holds the
    watermark back so the same event is in-watermark and reopens its
    session. Three files force watermark progression between
    triggers."""
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

    def ev(rows, sub):
        spark.createDataFrame(rows, "user_id long, ts string").select(
            "user_id", F.col("ts").cast("timestamp").alias("ts")
        ).coalesce(1).write.parquet(str(tmp_path / "late_src" / sub))

    # file a: user 1 opens a session at 0s; watermark after a = 0s
    ev([(1, "2024-01-01 00:00:00")], "a")
    # file b: clock event far ahead -> watermark jumps to 10:00,
    # closing user 1's session (expiry 0s+gap)
    ev([(9, "2024-01-01 10:00:00")], "b")
    # file c: user-1 event at 00:00:05 — BELOW the 10:00 watermark
    # (delay 0) -> dropped; within a 12h delay -> reopens
    ev([(1, "2024-01-01 00:00:05"), (9, "2024-01-02 10:00:00")], "c")

    def run(delay, name):
        stream = (
            spark.readStream.schema("user_id long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(str(tmp_path / "late_src"))
        )
        q = (
            user_event_sessions_tws(stream, gap_ms=10_000, delay=delay)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return sorted(
            (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
            for r in spark.table(name).collect()
        )

    base_us = 1_704_067_200_000_000
    strict = run("0 seconds", "t_late_strict")
    # user 1: ONE session of exactly the on-time event; the late 5s
    # event was dropped (no 1-row session for it either). user 9's
    # first session closes when the 2024-01-02 event moves the
    # watermark.
    u1 = [s for s in strict if s[0] == 1]
    assert u1 == [(1, base_us, base_us, 1)]
    assert all(s[0] in (1, 9) for s in strict)

    lax = run("12 hours", "t_late_lax")
    # with 12h lateness the 00:00:05 event is in-watermark: it lands
    # in (reopens) user 1's session -> one 2-event session once the
    # watermark (max ts - 12h) finally passes its expiry
    u1_lax = [s for s in lax if s[0] == 1]
    assert u1_lax == [(1, base_us, base_us + 5_000_000, 2)]
    spark.sql("DROP TABLE IF EXISTS t_late_strict")
    spark.sql("DROP TABLE IF EXISTS t_late_lax")


def test_event_time_sessions_applyinpandas_fallback(spark, tmp_path):
    """The applyInPandasWithState event-time twin must reproduce the
    typed-state session contract: reopen-across-triggers (late-ish
    event above the watermark merges, timer re-arms) and emit-once on
    watermark passage. Same fixture as the TWS two-trigger test."""
    from excel_to_database_spark.streaming.tws import (
        user_event_sessions_applyinpandas,
    )

    def ev(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts string"
        ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))

    src = tmp_path / "ev_aip_sess"
    ev([(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:00:05")]).coalesce(
        1
    ).write.parquet(str(src / "a"))
    ev([(1, "2024-01-01 00:00:08"), (2, "2024-01-01 00:01:00")]).coalesce(
        1
    ).write.parquet(str(src / "b"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        user_event_sessions_applyinpandas(stream, gap_ms=10_000)
        .writeStream.format("memory")
        .queryName("t_aip_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    base_us = 1_704_067_200_000_000
    got = [
        (r["user_id"], r["session_start_us"] - base_us,
         r["session_end_us"] - base_us, r["n_events"])
        for r in spark.table("t_aip_sessions").collect()
    ]
    assert got == [(1, 0, 8_000_000, 3)]
    spark.sql("DROP TABLE IF EXISTS t_aip_sessions")


def test_event_time_fallback_boundary_strict(spark, tmp_path):
    """Pin the firing boundary the q165 oracle encodes: GroupState
    event-time timeouts fire only when the watermark advances STRICTLY
    beyond the registered timestamp — an expiry exactly equal to the
    final watermark stays open and emits nothing (the typed-state
    surface fires at equality; the two oracles differ in exactly this
    clause)."""
    from excel_to_database_spark.streaming.tws import (
        user_event_sessions_applyinpandas,
    )

    src = tmp_path / "fb_bnd"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:00:10")],
        "user_id long, ts string",
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts")).coalesce(
        1
    ).write.parquet(str(src / "a"))
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        user_event_sessions_applyinpandas(stream, gap_ms=10_000)
        .writeStream.format("memory")
        .queryName("t_fb_boundary")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("t_fb_boundary").collect() == []
    spark.sql("DROP TABLE IF EXISTS t_fb_boundary")


def test_stream_bucket_drift_matches_batch(spark, sf_dir, tmp_path):
    """Per-micro-batch drift vs a persisted baseline must equal the
    batch tv_from_counts over the same (baseline, batch-slice) count
    pairs — two triggers, each checked independently; groups absent
    from a slice are skipped, not flagged."""
    from excel_to_database_spark.operators.text import tv_from_counts
    from excel_to_database_spark.streaming.ingest import stream_bucket_drift

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        if False
        else spark.read.parquet(f"{sf_dir}/orders.parquet")
    )
    obs = ev.select(
        F.col("o_orderpriority").alias("grp"),
        F.floor(F.col("o_totalprice") / F.lit(10000.0))
        .cast("bigint")
        .alias("b"),
        F.col("o_orderkey"),
    )
    base_slice = obs.filter(F.col("o_orderkey") % 3 == 0)
    stream_slice = obs.filter(F.col("o_orderkey") % 3 != 0)
    baseline = base_slice.groupBy("grp", "b").agg(
        F.count(F.lit(1)).alias("c_old")
    )

    src = tmp_path / "obs"
    half = F.col("o_orderkey") % 2 == 0
    stream_slice.filter(half).coalesce(1).write.parquet(str(src / "a"))
    stream_slice.filter(~half).coalesce(1).write.parquet(str(src / "b"))

    def expect_for(sl):
        bc = sl.groupBy("grp", "b").agg(F.count(F.lit(1)).alias("c_new"))
        per = (
            baseline.join(bc, ["grp", "b"], "full")
            .withColumn("c_old", F.coalesce("c_old", F.lit(0)))
            .withColumn("c_new", F.coalesce("c_new", F.lit(0)))
        )
        return {
            r["grp"]: (r["n_old"], r["n_new"], r["tv_distance"], r["drifted"])
            for r in tv_from_counts(per, group_col="grp", threshold=0.05)
            .filter((F.col("n_old") > 0) & (F.col("n_new") > 0))
            .collect()
        }

    spark.sql("DROP TABLE IF EXISTS t_stream_drift")
    stream = (
        spark.readStream.schema(stream_slice.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = stream_bucket_drift(
        stream,
        baseline,
        "t_stream_drift",
        bucket_col="b",
        group_col="grp",
        threshold=0.05,
        checkpoint=str(tmp_path / "ckpt_drift"),
    )
    q.awaitTermination()
    rows = spark.table("t_stream_drift").collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault(r["__batch_id"], {})[r["grp"]] = (
            r["n_old"], r["n_new"], r["tv_distance"], r["drifted"]
        )
    assert len(by_batch) == 2
    slices = {True: expect_for(stream_slice.filter(half)),
              False: expect_for(stream_slice.filter(~half))}
    # batch order = file order (one file per trigger); match each
    # emitted batch to whichever slice it equals, both must be hit
    matched = set()
    for _, got in by_batch.items():
        hit = [k for k, want in slices.items() if want == got]
        assert hit, f"no slice matches {got}"
        matched.add(hit[0])
    assert matched == {True, False}
    spark.sql("DROP TABLE IF EXISTS t_stream_drift")


def test_replay_helper_conf_restore_and_ckpt_cleanup(spark):
    """run_stream_to_memory must (a) cap replay state partitions
    without leaking the cap into the session (the conf is restored
    even though the cap only lowers, never raises, a small session
    setting), and (b) reclaim the RAM-backed checkpoint EAGERLY —
    rmtree right after awaitTermination (the round-11 advisor's tmpfs
    leak finding), with the _EPHEMERAL_CKPTS registration kept only
    as the deep_evict backstop for RocksDB-maintenance remnants."""
    import os

    from excel_to_database_spark.operators.caching import deep_evict
    from excel_to_database_spark.streaming import ingest as I

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    df = spark.readStream.format("rate").option("rowsPerSecond", "1").load()
    out = I.run_stream_to_memory(
        spark, df.select("value"), "t_replay_helper", output_mode="append"
    )
    assert out.count() >= 0
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    if I._fast_scratch_root() is not None:
        # the per-query checkpoint is registered (backstop) but its
        # tmpfs RAM is already reclaimed — eager rmtree, not deferred
        dirs = list(I._EPHEMERAL_CKPTS)
        ckpts = [d for d in dirs if "etds_replay_ckpt" in d]
        assert ckpts and not any(os.path.isdir(d) for d in ckpts)
        deep_evict(spark)
        assert not I._EPHEMERAL_CKPTS
        assert not any(os.path.isdir(d) for d in dirs)
