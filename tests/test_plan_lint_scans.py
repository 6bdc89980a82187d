"""Round-17 (verdict #7): the multi-scan lint is wired into the
correctness-sweep gate — a deliberately-introduced double-scan of a
base table must FAIL, a single-scan query must pass, and the counter
must not double-book AQE's Final/Initial duplicate printing."""

from excel_to_database_spark.operators.plan_lint import (
    MULTI_SCAN_ALLOWLIST,
    count_table_scans,
    lint_multi_scans,
)

_DETAIL = (
    "Output [2]: [doc_id#1L, text#2]\n"
    "Batched: true\n"
    "Location: InMemoryFileIndex [file:/root/testdata/sf0.01/{}.parquet]\n"
    "ReadSchema: struct<doc_id:bigint>\n"
)


def _node(node_id: int, table: str) -> str:
    return f"({node_id}) Scan parquet \n" + _DETAIL.format(table)


def test_count_two_distinct_scan_nodes():
    plan = _node(1, "documents") + "\n" + _node(7, "documents") + "\n" + _node(9, "orders")
    assert count_table_scans(plan) == {"documents": 2, "orders": 1}


def test_aqe_duplicate_node_ids_count_once():
    # AQE prints a cached relation under both Final and Initial plan
    # with the SAME node id — one physical scan
    plan = _node(3, "lineitem") + "\n== Initial Plan ==\n" + _node(3, "lineitem")
    assert count_table_scans(plan) == {"lineitem": 1}


def test_non_base_tables_ignored():
    plan = _node(1, "scratch_tmp") + "\n" + _node(2, "scratch_tmp")
    assert count_table_scans(plan) == {}


def test_deliberate_double_scan_fails_lint(spark, sf_dir):
    d1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d2 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doubled = d1.union(d2)
    hits = lint_multi_scans(doubled, "synthetic_double_scan")
    assert hits and "documents" in hits[0]


def test_single_scan_passes_lint(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = d.groupBy("lang").count()
    assert lint_multi_scans(out, "synthetic_single_scan") == []


def test_allowlist_suppresses(spark, sf_dir):
    d1 = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    doubled = d1.union(d1)
    try:
        MULTI_SCAN_ALLOWLIST["synthetic_allowed"] = "test: deliberate union"
        assert lint_multi_scans(doubled, "synthetic_allowed") == []
    finally:
        MULTI_SCAN_ALLOWLIST.pop("synthetic_allowed", None)


def test_allowlist_entries_carry_reasons():
    for name, reason in MULTI_SCAN_ALLOWLIST.items():
        assert isinstance(reason, str) and reason.strip(), name
