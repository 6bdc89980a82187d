"""Round-16 verdict #3: bless selection must follow the pre-committed
cal-band/same-tree rule, never an outcome-based "best N of M" pick.
Pure JSON logic — no Spark session."""

import json

import pytest

from scripts.bless_bench import CAL_BAND, MIN_RUNS, auto_select, bless


def _rec(total: float, cal: float, tree: str = "T" * 12) -> dict:
    return {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": {"q01_pricing_summary": total / 2, "q76_dedup_minhash_lsh": total / 2},
        "sf": 0.1,
        "sandbox_cal": cal,
        "code_tree": tree,
    }


def _write(tmp_path, name, rec):
    p = tmp_path / name
    p.write_text(json.dumps(rec))
    return str(p)


def test_auto_selects_by_cal_band_not_by_total(tmp_path):
    # the WORST total inside the band is selected; the BEST total
    # outside the band is excluded — outcome cannot drive the pick
    _write(tmp_path, "bench_1.json", _rec(200.0, 0.40))
    _write(tmp_path, "bench_2.json", _rec(180.0, 0.45))
    _write(tmp_path, "bench_3.json", _rec(190.0, 0.35))
    _write(tmp_path, "bench_4.json", _rec(100.0, 0.86))  # fast, degraded stamp
    paths, sel = auto_select(str(tmp_path), "T" * 12)
    names = [p.rsplit("/", 1)[-1] for p in paths]
    assert names == ["bench_1.json", "bench_2.json", "bench_3.json"]
    assert "bench_4.json" in sel["excluded"]
    assert "outside band" in sel["excluded"]["bench_4.json"]
    assert sel["cal_band"] == list(CAL_BAND)


def test_auto_excludes_other_code_trees(tmp_path):
    _write(tmp_path, "bench_1.json", _rec(100.0, 0.40))
    _write(tmp_path, "bench_2.json", _rec(100.0, 0.40))
    _write(tmp_path, "bench_3.json", _rec(100.0, 0.40, tree="OLD"))
    _write(tmp_path, "bench_4.json", _rec(100.0, 0.40))
    paths, sel = auto_select(str(tmp_path), "T" * 12)
    assert len(paths) == 3
    assert "bench_3.json" in sel["excluded"]


def test_auto_refuses_below_min_runs(tmp_path):
    for i in range(MIN_RUNS - 1):
        _write(tmp_path, f"bench_{i}.json", _rec(100.0, 0.40))
    with pytest.raises(SystemExit):
        auto_select(str(tmp_path), "T" * 12)


def test_bless_refuses_mixed_code_trees(tmp_path):
    a = _write(tmp_path, "bench_a.json", _rec(100.0, 0.40, tree="AAA"))
    b = _write(tmp_path, "bench_b.json", _rec(100.0, 0.40, tree="BBB"))
    with pytest.raises(SystemExit):
        bless([a, b])


def test_bless_records_selection_provenance(tmp_path):
    a = _write(tmp_path, "bench_a.json", _rec(100.0, 0.40))
    b = _write(tmp_path, "bench_b.json", _rec(120.0, 0.45))
    c = _write(tmp_path, "bench_c.json", _rec(110.0, 0.35))
    out = bless([a, b, c], {"mode": "auto", "cal_band": list(CAL_BAND)})
    assert out["selection"]["mode"] == "auto"
    assert out["queries"]["q01_pricing_summary"] == 55.0  # cross-run median
    assert out["code_tree"] == "T" * 12
