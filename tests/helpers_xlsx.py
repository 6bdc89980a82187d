"""Test-only minimal .xlsx writer (OOXML by hand, stdlib zipfile).

Builds just enough of ECMA-376 to exercise the engine's reader: shared
strings, numeric cells, date-styled cells, hidden rows/columns, multiple
sheets."""

from __future__ import annotations

import io
import zipfile

_CT = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{overrides}
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

# styles: xf 0 = general, xf 1 = builtin date (numFmtId 14),
# xf 2 = custom date format (numFmtId 164 "dd/mm/yyyy"),
# xf 3 = custom NON-date format with quoted literal 'd' ("0.0 \"days\""),
# xf 4 = builtin time (numFmtId 21 "h:mm:ss"),
# xf 5 = custom time (numFmtId 166 "hh:mm:ss"),
# xf 6 = builtin datetime (numFmtId 22 "m/d/yy h:mm")
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<numFmts count="3">
<numFmt numFmtId="164" formatCode="dd/mm/yyyy"/>
<numFmt numFmtId="165" formatCode="0.0&quot;days&quot;"/>
<numFmt numFmtId="166" formatCode="hh:mm:ss"/>
</numFmts>
<cellXfs count="7">
<xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/>
<xf numFmtId="164" applyNumberFormat="1"/><xf numFmtId="165" applyNumberFormat="1"/>
<xf numFmtId="21" applyNumberFormat="1"/><xf numFmtId="166" applyNumberFormat="1"/>
<xf numFmtId="22" applyNumberFormat="1"/>
</cellXfs>
</styleSheet>"""


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def build_xlsx(
    sheets: dict[str, list[list]],
    date_styles: dict[tuple[str, int, int], int] | None = None,
    hidden_rows: dict[str, set[int]] | None = None,
    hidden_cols: dict[str, set[int]] | None = None,
) -> bytes:
    """sheets: {name: matrix}; cells may be str (→ shared string) or
    int/float (→ numeric). date_styles maps (sheet, row, col) → style
    index (1 builtin-date, 2 custom-date, 3 custom-non-date)."""
    date_styles = date_styles or {}
    hidden_rows = hidden_rows or {}
    hidden_cols = hidden_cols or {}
    shared: list[str] = []
    shared_idx: dict[str, int] = {}

    def sref(s: str) -> int:
        if s not in shared_idx:
            shared_idx[s] = len(shared)
            shared.append(s)
        return shared_idx[s]

    sheet_xmls = {}
    for name, matrix in sheets.items():
        rows_xml = []
        for r, row in enumerate(matrix):
            hidden = ' hidden="1"' if r in hidden_rows.get(name, set()) else ""
            cells = []
            for c, val in enumerate(row):
                if val is None or val == "":
                    continue
                ref = f"{_col_letter(c)}{r + 1}"
                style = date_styles.get((name, r, c), 0)
                s_attr = f' s="{style}"' if style else ""
                if isinstance(val, str):
                    cells.append(f'<c r="{ref}" t="s"{s_attr}><v>{sref(val)}</v></c>')
                else:
                    cells.append(f'<c r="{ref}"{s_attr}><v>{val}</v></c>')
            rows_xml.append(f'<row r="{r + 1}"{hidden}>{"".join(cells)}</row>')
        cols_xml = ""
        if name in hidden_cols and hidden_cols[name]:
            col_els = "".join(
                f'<col min="{c + 1}" max="{c + 1}" hidden="1"/>' for c in sorted(hidden_cols[name])
            )
            cols_xml = f"<cols>{col_els}</cols>"
        sheet_xmls[name] = (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f"{cols_xml}<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
        )

    names = list(sheets)
    wb_sheets = "".join(
        f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>' for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT.format(overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/styles.xml", _STYLES)
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xmls[n])
    return buf.getvalue()
