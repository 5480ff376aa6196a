"""Minimal pure-Python .xlsx reader/writer (no openpyxl needed).

Closes SURVEY.md §2.1 S3/S4's file-format contract (reference
backend/io.py:55–361 writes real Excel workbooks): an .xlsx file is a
ZIP of SpreadsheetML XML parts, so the subset the scenario I/O needs —
one table per sheet, header row, strings + numbers — is implementable
with ``zipfile`` + ``ElementTree`` from the standard library.

Writer notes:
- strings are written as inline strings (``t="inlineStr"``) — no shared
  string table to build, and every mainstream reader (Excel, openpyxl,
  pandas, LibreOffice) accepts them;
- numbers are written as plain ``<v>`` cells; NaN/None cells are omitted;
- sheet names are the item names (the reference's sheet-per-item layout).

Reader notes:
- handles both inline strings and the shared-string table (``t="s"``),
  so files written by Excel/openpyxl read back too;
- column types are inferred pandas-style: all-integral → int64,
  numeric → float64, else object — matching what ``pd.read_excel``
  produces for the reference's sheets.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _col_letter(i: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    i += 1
    while i:
        i, r = divmod(i - 1, 26)
        out = chr(ord("A") + r) + out
    return out


def _col_index(ref: str) -> int:
    """A1-style cell ref → 0-based column index."""
    letters = re.match(r"([A-Z]+)", ref).group(1)
    i = 0
    for ch in letters:
        i = i * 26 + (ord(ch) - ord("A") + 1)
    return i - 1


def _sheet_xml(df: pd.DataFrame) -> str:
    rows = []

    def cell(ref: str, v) -> str:
        if v is None or (isinstance(v, float) and v != v):  # NaN
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return (
            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
            f"{escape(str(v))}</t></is></c>"
        )

    header = "".join(
        cell(f"{_col_letter(c)}1", str(col)) for c, col in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header}</row>')
    for r, (_, row) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            cell(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row)
        )
        rows.append(f'<row r="{r}">{cells}</row>')
    return (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>{"".join(rows)}</sheetData>'
        f"</worksheet>"
    )


def write_xlsx(path: str, sheets: dict[str, pd.DataFrame]) -> None:
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            f'ContentType="application/vnd.openxmlformats-officedocument.'
            f'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/'
            "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
            f'"/>{overrides}</Types>',
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_PKG_REL}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_entries = "".join(
            f'<sheet name={quoteattr(n)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
            f"<sheets>{sheet_entries}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            "openxmlformats.org/officeDocument/2006/relationships/worksheet"
            f'" Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{_NS_PKG_REL}">{rels}</Relationships>',
        )
        for i, n in enumerate(names):
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(sheets[n]))


def _infer_column(values: list):
    """pandas-read_excel-style dtype inference for one column."""
    non_null = [v for v in values if v is not None]
    if non_null and all(isinstance(v, (int, float)) for v in non_null):
        if all(isinstance(v, int) or float(v).is_integer() for v in non_null):
            if len(non_null) == len(values):
                return pd.array([int(v) for v in values], dtype="int64")
            return pd.array(
                [None if v is None else float(v) for v in values],
                dtype="float64",
            )
        return pd.array(
            [None if v is None else float(v) for v in values], dtype="float64"
        )
    return pd.array(values, dtype=object)


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{{{_NS}}}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS}}}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_by_rid = {
            rel.get("Id"): rel.get("Target")
            for rel in rels.findall(f"{{{_NS_PKG_REL}}}Relationship")
        }
        out: dict[str, pd.DataFrame] = {}
        for sheet in wb.iter(f"{{{_NS}}}sheet"):
            name = sheet.get("name")
            target = target_by_rid[sheet.get(f"{{{_NS_REL}}}id")]
            if not target.startswith("/"):
                target = "xl/" + target
            root = ET.fromstring(z.read(target.lstrip("/")))
            grid: list[dict[int, object]] = []
            for row in root.iter(f"{{{_NS}}}row"):
                cells: dict[int, object] = {}
                for c in row.findall(f"{{{_NS}}}c"):
                    ci = _col_index(c.get("r"))
                    t = c.get("t")
                    if t == "inlineStr":
                        cells[ci] = "".join(
                            el.text or "" for el in c.iter(f"{{{_NS}}}t")
                        )
                    else:
                        v = c.find(f"{{{_NS}}}v")
                        if v is None or v.text is None:
                            continue
                        if t == "s":
                            cells[ci] = shared[int(v.text)]
                        elif t == "b":
                            cells[ci] = bool(int(v.text))
                        elif t == "str":
                            cells[ci] = v.text
                        else:
                            num = float(v.text)
                            cells[ci] = int(num) if num.is_integer() else num
                grid.append(cells)
            if not grid:
                out[name] = pd.DataFrame()
                continue
            header_cells, body = grid[0], grid[1:]
            ncol = max(header_cells, default=-1) + 1
            cols = [str(header_cells.get(i, f"col{i}")) for i in range(ncol)]
            data = {
                cols[i]: _infer_column([r.get(i) for r in body])
                for i in range(ncol)
            }
            out[name] = pd.DataFrame(data, columns=cols)
        return out
