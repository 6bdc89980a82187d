"""Unit tests for the behavioral operators (funnel, retention,
gaps-and-islands) on hand-checkable synthetic events."""

import datetime as dt

from pyspark.sql import functions as F

from excel_to_database_spark.operators.funnel import (
    funnel_counts,
    funnel_times,
    islands,
    retention_matrix,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_ordering(spark):
    e = _events(
        spark,
        [
            # u1 completes the funnel in order
            (1, _ts("2024-01-01T00:00"), "signup"),
            (1, _ts("2024-01-01T01:00"), "view"),
            (1, _ts("2024-01-01T02:00"), "click"),
            # u2 clicked BEFORE viewing → stops at view
            (2, _ts("2024-01-01T00:00"), "signup"),
            (2, _ts("2024-01-01T00:30"), "click"),
            (2, _ts("2024-01-01T01:00"), "view"),
            # u3 never signed up → in no stage
            (3, _ts("2024-01-01T00:00"), "view"),
            (3, _ts("2024-01-01T01:00"), "click"),
        ],
    )
    out = funnel_counts(e, "user_id", "ts", "event_type", ["signup", "view", "click"])
    got = {r["stage"]: r["n_keys"] for r in out.collect()}
    assert got == {"0_signup": 2, "1_view": 2, "2_click": 1}


def test_funnel_equal_ts_not_counted(spark):
    # stage i+1 requires strictly-later ts than stage i entry
    e = _events(
        spark,
        [
            (1, _ts("2024-01-01T00:00"), "signup"),
            (1, _ts("2024-01-01T00:00"), "view"),
        ],
    )
    frames = funnel_times(e, "user_id", "ts", "event_type", ["signup", "view"])
    assert frames[0].count() == 1 and frames[1].count() == 0


def test_retention_matrix_offsets(spark):
    e = _events(
        spark,
        [
            # u1: first event day 0 (epoch week w0), active again day 8 (w1)
            (1, _ts("1970-01-01T12:00"), "view"),
            (1, _ts("1970-01-09T12:00"), "view"),
            # u2: only week 0
            (2, _ts("1970-01-02T12:00"), "view"),
        ],
    )
    out = retention_matrix(e, "user_id", "ts", period_days=7)
    got = {(r["cohort_period"], r["period_offset"]): r["n_keys"] for r in out.collect()}
    assert got == {(0, 0): 2, (0, 1): 1}


def test_islands_runs(spark):
    e = _events(
        spark,
        [
            # u1 active days 0,1,2 then 5 → runs of 3 and 1
            (1, _ts("1970-01-01T03:00"), "view"),
            (1, _ts("1970-01-01T09:00"), "view"),  # same day, deduped
            (1, _ts("1970-01-02T00:00"), "view"),
            (1, _ts("1970-01-03T23:00"), "view"),
            (1, _ts("1970-01-06T00:00"), "view"),
        ],
    )
    out = islands(e, "user_id", "ts").orderBy("island_start_day").collect()
    assert [(r["island_start_day"], r["run_days"]) for r in out] == [(0, 3), (5, 1)]


def test_islands_single_window_no_global_sort(spark):
    e = _events(spark, [(1, _ts("2024-01-01T00:00"), "view")])
    plan = islands(e, "user_id", "ts")._jdf.queryExecution().executedPlan().toString()
    # the islands window must partition by key, never sort globally
    assert "SortExec" not in plan or "hashpartitioning" in plan.lower()
