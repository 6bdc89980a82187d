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


def write_excel(
    df: DataFrame, path: str, sheet_name: str = "Sheet1", max_rows: int = EXCEL_MAX_ROWS
) -> int:
    """Write ``df`` (header + rows, all rendered as text — the
    reference's all-text sheet model) to ``path``. Returns the number of
    data rows written; raises if the sheet cap would be exceeded."""
    n = 0
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        rows_xml = [_row_xml(1, list(df.columns))]
        for row in df.toLocalIterator():
            n += 1
            if n >= max_rows:  # header occupies one row of the cap
                raise ValueError(
                    f"sheet cap {max_rows} rows exceeded; export a filtered/"
                    "aggregated frame, or use parquet/CSV sinks for bulk data"
                )
            rows_xml.append(_row_xml(n + 1, [row[c] for c in df.columns]))
        z.writestr(
            "xl/worksheets/sheet1.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>",
        )
    return n
