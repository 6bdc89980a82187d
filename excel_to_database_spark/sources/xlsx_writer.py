"""Minimal .xlsx writer — export a DataFrame as a single-sheet workbook
the reference's users could re-upload (and our reader round-trips).

Excel's format caps a sheet at 1,048,576 rows, so export is inherently
small-data: rows stream through ``toLocalIterator`` (one partition in
memory at a time) with the cap enforced — this is an egress affordance,
not a data-plane operator. Cells are written as inline strings (valid
OOXML; no shared-string table needed)."""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

EXCEL_MAX_ROWS = 1_048_576

_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name, {chr(34): "&quot;"})}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _row_xml(idx: int, cells: list[str]) -> str:
    parts = [f'<row r="{idx}">']
    for value in cells:
        if value is None or value == "":
            parts.append("<c/>")
        else:
            parts.append(f'<c t="inlineStr"><is><t>{escape(str(value))}</t></is></c>')
    parts.append("</row>")
    return "".join(parts)


def _write_workbook(path: str, sheet_name: str, rows_xml: list[str]) -> None:
    """Assemble one single-sheet workbook from pre-rendered row XML."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
        )


def write_excel(
    df: DataFrame, path: str, sheet_name: str = "Sheet1", max_rows: int = EXCEL_MAX_ROWS
) -> int:
    """Write ``df`` (header + rows, all rendered as text — the
    reference's all-text sheet model) to ``path``. Returns the number of
    data rows written; raises if the sheet cap would be exceeded.

    This is the SINGLE-file writer: rows stream through the driver
    (``toLocalIterator``, one partition in memory at a time) because one
    .xlsx is one unsplittable zip. For exports that should scale with
    the cluster, use :func:`write_excel_dir` — one workbook per
    partition, written executor-side."""
    n = 0
    rows_xml = [_row_xml(1, list(df.columns))]
    for row in df.toLocalIterator():
        n += 1
        if n >= max_rows:  # header occupies one row of the cap
            raise ValueError(
                f"sheet cap {max_rows} rows exceeded; export a filtered/"
                "aggregated frame, or use parquet/CSV sinks for bulk data"
            )
        rows_xml.append(_row_xml(n + 1, [row[c] for c in df.columns]))
    _write_workbook(path, sheet_name, rows_xml)
    return n


def write_excel_dir(
    df: DataFrame,
    path: str,
    sheet_name: str = "Sheet1",
    max_rows: int = EXCEL_MAX_ROWS,
) -> int:
    """Partition-parallel Excel export: one workbook PER PARTITION,
    rendered and zipped executor-side (Arrow-batched ``mapInPandas`` —
    no rows ever pass through the driver), all sharing the header row —
    exactly the directory layout ``read_excel``'s directory ingest
    consumes, so a multi-file export round-trips through the same
    reader. The driver only collects the per-partition report (one
    (file, n_rows) row per partition).

    The per-SHEET format cap applies per file here, so the exportable
    volume scales with partition count instead of being a single-sheet
    ceiling; repartition the frame to size each workbook. ``path`` must
    be a filesystem every executor can write (shared mount on a real
    cluster; any local dir on local[N]). Empty partitions write no
    file. Returns total data rows written."""
    import os
    from collections.abc import Iterator

    os.makedirs(path, exist_ok=True)
    cols = list(df.columns)

    def write_part(batches) -> Iterator:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows_xml = [_row_xml(1, cols)]
        n = 0
        for pdf in batches:
            for tup in pdf.itertuples(index=False):
                n += 1
                if n >= max_rows:
                    raise ValueError(
                        f"sheet cap {max_rows} rows exceeded in partition "
                        f"{pid}; repartition the frame into more files"
                    )
                rows_xml.append(
                    _row_xml(
                        n + 1,
                        # scalar-only isna: array-typed cells (list, or
                        # the ndarray Arrow hands mapInPandas) make
                        # pd.isna ambiguous — normalize them to the
                        # plain list the single-file writer stringifies
                        [
                            list(v)
                            if isinstance(v, (list, tuple))
                            or getattr(v, "ndim", 0)
                            else (None if pd.isna(v) else v)
                            for v in tup
                        ],
                    )
                )
        fname = ""
        if n:
            fname = os.path.join(path, f"part-{pid:05d}.xlsx")
            _write_workbook(fname, sheet_name, rows_xml)
        yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    report = df.mapInPandas(write_part, "file string, n_rows long").collect()
    return int(sum(r["n_rows"] for r in report))
