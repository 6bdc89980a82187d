"""Sniffer decision-procedure tests. The first two cases are the seed
asserts from the reference's only self-test (app/csv_sniff.py:26-31)."""

from excel_to_database_spark.sources.csv_sniff import sniff_delimiter


def test_pipe_detected():
    assert sniff_delimiter("a|b|c\n1|2|3\n4|5|6") == "|"


def test_ambiguous_falls_back_to_default():
    assert sniff_delimiter("abc\ndef\nghi") == ","


def test_tab_and_semicolon():
    assert sniff_delimiter("a\tb\n1\t2") == "\t"
    assert sniff_delimiter("a;b;c\n1;2;3") == ";"


def test_ragged_rows_disqualify():
    # ';' splits unevenly → invalid; ',' consistent → wins
    assert sniff_delimiter("a,b;x\nc,d\ne,f") == ","


def test_max_columns_wins_and_tie_keeps_earlier():
    assert sniff_delimiter("a,b;c,d\ne,f;g,h") == ","  # tie at 2+? ',' earlier
    assert sniff_delimiter("a;b;c\nd;e;f") == ";"


def test_sample_bound_is_ten_lines():
    # delimiter only consistent within the first 10 lines; raggedness
    # beyond the sample must not disqualify
    text = "\n".join(["a|b"] * 10 + ["c|d|e"])
    assert sniff_delimiter(text) == "|"


def test_quoted_fields():
    assert sniff_delimiter('a,"b,c",d\n1,"2,3",4') == ","
