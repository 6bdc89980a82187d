from excel_to_database_spark.naming import sanitize_columns, sqlify, to_alnum


def test_to_alnum_strips_specials():
    assert to_alnum("Order Date!") == "OrderDate"
    assert to_alnum("a_b-c.d") == "a_bcd"
    assert to_alnum("2021 (Q1)") == "2021Q1"
    assert to_alnum("plain_ok_123") == "plain_ok_123"


def test_sqlify_lowers_and_collapses():
    assert sqlify("My Sheet (2021)") == "my_sheet_2021_"
    assert sqlify("Already_ok") == "already_ok"
    assert sqlify("a--b..c") == "a_b_c"


def test_sanitize_columns_dedup_and_empty():
    assert sanitize_columns(["a", "a", "a!"]) == ["a", "a_2", "a_3"]
    assert sanitize_columns(["", "!!", "x"]) == ["col_0", "col_1", "x"]
