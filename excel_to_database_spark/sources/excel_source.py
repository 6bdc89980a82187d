"""Distributed Excel reader: ``binaryFile`` scan → per-executor decode.

The workbook bytes are read by Spark's binary-file source and decoded by
``xlsx_core.WorkbookReader`` inside ``mapInPandas`` — one task per
workbook (xlsx is an unsplittable zip, format-capped at ~1M rows, so a
file is the right task granule; a *directory* of workbooks parallelizes
across executors, which is the scale path). The driver only ever opens
one file's header to fix the schema — never data rows.

Parity notes: header = row 0 promoted to sanitized column names
(reference app/data.py:121, :24-27); all columns ``StringType``
(data.py:57-62); ``visible_only`` mirrors the VBA visible-only
submission (VBA/Excel2Database.vb:46-88).
"""

from __future__ import annotations

import glob as _glob
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from excel_to_database_spark.naming import sanitize_columns
from excel_to_database_spark.sources.xlsx_core import WorkbookReader


def sheet_names(path: str) -> list[str]:
    """Enumerate sheets of a local workbook (driver-side, metadata only)."""
    with open(path, "rb") as f:
        return WorkbookReader(f.read()).sheet_names()


def _header_of(
    path: str, sheet: str | None, visible_only: bool, bug_compat: bool
) -> tuple[str, list[str], list[int]]:
    with open(path, "rb") as f:
        rdr = WorkbookReader(f.read(), bug_compat)  # header cells: time mode irrelevant
    name = sheet or rdr.sheet_names()[0]
    # bounded probe: parse ONE row, not the whole sheet — driver work
    # stays O(1) regardless of workbook size (sheet_columns falls back
    # to a full read only when the first XML row carries no text at
    # all). Also returns each header position's RAW sheet column index,
    # the currency of read_sheet's column pruning.
    header, raw_cols = rdr.sheet_columns(name, visible_only)
    if not header:
        raise ValueError(f"sheet {name!r} of {path} is empty")
    return name, header, raw_cols


def _decode_body(
    content: bytes,
    sheet_name: str,
    visible_only: bool,
    bug_compat_1900: bool,
    keep_time: bool,
    times: bool,
    want_raw: set[int] | None,
    positions: list[int],
    n_full: int,
) -> list[list[str]]:
    """The per-workbook decode the executors run inside ``read_excel``'s
    ``mapInPandas`` — module-level so the cell-touch contract (pruned
    columns never reach the value decoder) is testable in-process."""
    rdr = WorkbookReader(bytes(content), bug_compat_1900, keep_time, times)
    matrix = rdr.read_sheet(sheet_name, visible_only, want_cols=want_raw)
    return [
        [padded[p] for p in positions]
        for r in matrix[1:]
        for padded in ((r + [""] * n_full)[:n_full],)
    ]


def read_excel(
    spark: SparkSession,
    path: str,
    sheet: str | None = None,
    visible_only: bool = False,
    bug_compat_1900: bool = False,
    sanitize: bool = True,
    keep_time: bool = False,
    times: bool = False,
    columns: list[str] | None = None,
) -> DataFrame:
    """Read one sheet (by name; default first) from ``path`` — a file,
    glob, or directory of .xlsx files sharing a header — as an
    all-string DataFrame. ``keep_time`` renders date-styled cells with
    their time-of-day (engine extension; the reference drops it).
    ``times`` additionally decodes TIME-of-day numFmts (builtin ids
    18-21/45-47 and custom h/s codes) as ``HH:MM:SS`` — a documented
    divergence from the reference, which skips times entirely
    (xlsparser.js:52); off by default for byte-parity. Combine with
    ``promote_temporal_columns`` for typed Date/Timestamp output.

    ``columns`` is column pruning pushed INTO the decoder: only the
    named (post-sanitize) columns have their cells value-decoded —
    pruned columns skip shared-string dereference and date/number
    rendering inside ``read_sheet`` — and the result carries exactly
    those columns, in the requested order. A downstream ``.select``
    cannot reach inside ``mapInPandas`` (and the Python DataSource API
    has no column-pruning hook yet, SURVEY §4.2), so projection over
    wide workbooks should be declared here."""
    import os as _os

    pattern = _os.path.join(path, "*.xlsx") if _os.path.isdir(path) else path
    candidates = sorted(_glob.glob(pattern)) or [path]
    first = next((p for p in candidates if p.endswith(".xlsx")), candidates[0])
    sheet_name, header, raw_cols = _header_of(first, sheet, visible_only, bug_compat_1900)
    cols = sanitize_columns(header) if sanitize else [str(h) for h in header]
    n_full = len(cols)
    if columns is not None:
        missing = [c for c in columns if c not in cols]
        if missing:
            raise ValueError(f"columns {missing} not in sheet columns {cols}")
        positions = [cols.index(c) for c in columns]
        # wanted raw indices; header cells stay decoded for free (the
        # probe already ran), body cells outside this set are skipped
        want_raw: set[int] | None = {raw_cols[p] for p in positions}
        out_cols = list(columns)
    else:
        positions = list(range(n_full))
        want_raw = None
        out_cols = cols
    out_schema = StructType([StructField(c, StringType()) for c in out_cols])

    def decode(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for _, row in pdf.iterrows():
                body = _decode_body(
                    row["content"],
                    sheet_name,
                    visible_only,
                    bug_compat_1900,
                    keep_time,
                    times,
                    want_raw,
                    positions,
                    n_full,
                )
                yield pd.DataFrame(body, columns=out_cols, dtype=str) if body else pd.DataFrame(
                    {c: pd.Series(dtype=str) for c in out_cols}
                )

    files = spark.read.format("binaryFile").option("pathGlobFilter", "*.xlsx").load(path)
    return files.select("content").mapInPandas(decode, schema=out_schema)


def promote_temporal_columns(
    df: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Opt-in typed promotion over the all-string Excel read: string
    columns whose every non-empty value is a rendered date
    (``YYYY-MM-DD`` → DateType), datetime (``YYYY-MM-DD HH:MM:SS`` →
    TimestampType) or time-of-day (``HH:MM:SS`` → TimestampType on
    1970-01-01) are cast; mixed or free-text columns stay strings.
    This is the Date/Timestamp surface the reference never offers (it
    emits display strings and skips times, xlsparser.js:52) — kept OUT
    of read_excel's default path so default output stays byte-parity.

    One aggregate pass classifies ALL candidate columns together
    (per-column match counts vs non-empty counts — no per-column
    jobs); the casts themselves are plain Catalyst expressions, so
    pushdown/pruning on the promoted frame behave like any typed
    source."""
    from pyspark.sql import functions as F

    date_re = r"^\d{4}-\d{2}-\d{2}$"
    dt_re = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"
    time_re = r"^\d{2}:\d{2}:\d{2}$"
    cand = [
        c for c in (columns if columns is not None else df.columns)
        if dict(df.dtypes).get(c) == "string"
    ]
    if not cand:
        return df

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0))

    aggs = []
    for c in cand:
        col, ne = F.col(c), F.col(c) != ""
        aggs += [
            cnt(ne & col.isNotNull()).alias(f"{c}__n"),
            cnt(col.rlike(date_re)).alias(f"{c}__d"),
            cnt(col.rlike(dt_re)).alias(f"{c}__dt"),
            cnt(col.rlike(time_re)).alias(f"{c}__t"),
        ]
    stats = df.agg(*aggs).collect()[0]

    out = []
    for c in df.columns:
        if c not in cand or stats[f"{c}__n"] == 0:
            out.append(F.col(c))
            continue
        n = stats[f"{c}__n"]
        empty_as_null = F.when(F.col(c) == "", None).otherwise(F.col(c))
        if stats[f"{c}__d"] == n:
            out.append(F.to_date(empty_as_null).alias(c))
        elif stats[f"{c}__dt"] == n:
            out.append(F.to_timestamp(empty_as_null).alias(c))
        elif stats[f"{c}__t"] == n:
            out.append(
                F.to_timestamp(
                    F.concat(F.lit("1970-01-01 "), empty_as_null)
                ).alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)
