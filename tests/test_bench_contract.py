"""Driver-contract tests for the bench stdout line (round-16 verdict
#1: the driver parses the JSON line out of a 2000-char stdout TAIL —
BENCH_r15 completed rc=0 and still parsed null because the full-name
per-query map is ~2900 chars. These tests pin the fix: qNN short keys,
a deterministic overflow trimmer, and a worst-case line length bound).
No Spark session needed — pure dict/JSON logic."""

import json

import bench
from bench import COMPACT_LINE_MAX, HEADLINE, build_compact, short_key

ETL_ROWS = [
    "etl_csv_sync",
    "etl_xlsx_sync",
    "etl_xlsx_dir_sync",
    "etl_xlsx_dir_sync_small",
]

# the REAL slope suite: if it grows, the worst-case bound below grows
# with it and the length test fails before the driver window does
from scripts.scale_slope import SLOPE_QUERIES


def test_short_keys_unique_across_all_bench_rows():
    keys = [short_key(q) for q in HEADLINE] + [short_key(e) for e in ETL_ROWS]
    assert len(set(keys)) == len(keys), "qNN prefixes must be unique"


def test_short_key_shapes():
    assert short_key("q76_dedup_minhash_lsh") == "q76"
    assert short_key("q146_ivf_pq_index_build") == "q146"
    # etl rows keep their full (unique) names
    assert short_key("etl_csv_sync") == "etl_csv_sync"


def _slope_block(factor: int, dirty: int, adopted: int, skipped: int) -> dict:
    ran = SLOPE_QUERIES[: len(SLOPE_QUERIES) - skipped]
    blk = {
        "factor": factor,
        "slope": {q: 999.99 for q in ran},
        "base": {q: 999.999 for q in ran},
        "scaled": {q: 9999.999 for q in ran},
        "clean": {q: (i >= dirty) for i, q in enumerate(ran)},
    }
    if adopted:
        blk["adopted"] = {q: {"from": "x"} for q in ran[dirty : dirty + adopted]}
    if skipped:
        blk["skipped_budget"] = SLOPE_QUERIES[-skipped:]
    return blk


def _worst_case_out() -> dict:
    # every value at its widest realistic JSON rendering; both slope
    # suites present with every hygiene flag populated at once
    queries = {q: 9999.999 for q in HEADLINE}
    queries.update({e: 9999.999 for e in ETL_ROWS})
    return {
        "metric": "headline_queries_total_runtime",
        "value": 99999.999,
        "unit": "sec",
        "queries": queries,
        "sf": 0.1,
        "reps": 3,
        "aggregation": "median",
        "sandbox_cal": 99.999,
        "git_head": "a" * 40,
        "code_tree": "b" * 32,
        "budget_s": 99999.0,
        "elapsed_s": 99999.9,
        "scale_slope": _slope_block(10, dirty=6, adopted=3, skipped=3),
        "scale_slope_30x": _slope_block(30, dirty=6, adopted=3, skipped=3),
    }


def test_worst_case_line_fits_driver_tail_window():
    out = _worst_case_out()
    compact = build_compact(out, "bench_runs/bench_20991231T235959Z.json")
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= COMPACT_LINE_MAX, len(line)
    assert COMPACT_LINE_MAX <= 1800  # the driver window is 2000 chars


def test_trimmer_never_touches_contract_keys():
    out = _worst_case_out()
    compact = build_compact(out, "bench_runs/bench_20991231T235959Z.json")
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in compact, key
    # every bench row survives, under its short key, at 2 decimals
    assert len(compact["queries"]) == len(HEADLINE) + len(ETL_ROWS)
    assert compact["queries"]["q76"] == 10000.0
    # the trimmer announced itself
    assert compact.get("trimmed") is True


def test_typical_line_needs_no_trimming_and_keeps_slope():
    out = _worst_case_out()
    # realistic magnitudes: seconds are < 100, slopes < 20
    out["queries"] = {q: 3.141 for q in out["queries"]}
    out["value"] = 146.703
    del out["scale_slope_30x"]  # 30x is opt-in since round 17
    blk = out["scale_slope"]
    for d in (blk["slope"], blk["base"], blk["scaled"]):
        for q in d:
            d[q] = 4.25
    blk["clean"] = {q: True for q in blk["clean"]}
    blk.pop("adopted", None)
    blk.pop("skipped_budget", None)
    compact = build_compact(out, "bench_runs/bench_20991231T235959Z.json")
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= COMPACT_LINE_MAX
    assert "trimmed" not in compact
    assert compact["slope_10x"]["q122"] == 4.25
    assert compact["reps"] == 3


def test_non_default_slope_factor_still_trims():
    out = _worst_case_out()
    out["scale_slope"]["factor"] = 5  # label becomes slope_5x
    compact = build_compact(out, "bench_runs/bench_20991231T235959Z.json")
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) <= COMPACT_LINE_MAX, len(line)


def test_headline_unchanged_from_round16():
    # round-16 verdict #9: NO new bench rows in round 17 — growth in
    # the headline list is what outgrew the driver's tail window
    assert len(HEADLINE) + len(ETL_ROWS) == 93
    assert bench.BENCH_BUDGET_S > 0
