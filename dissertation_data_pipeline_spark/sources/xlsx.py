"""Stdlib xlsx codec (SURVEY S2/K3) — zip + SpreadsheetML, no openpyxl.

The reference reads curation spreadsheets and writes styled report
workbooks (legiscan_normalizer.py:137, 386-399). Those files are
dim-sized (hundreds of rows), so a driver-side codec is the honest
mapping — but gating it on openpyxl left the capability stubbed in
containers without the library. xlsx is just a zip of small XML parts,
and the subset these files use (one sheet, scalar cells, column
widths) is fully expressible with ``zipfile`` + ``xml.etree``:

- **read**: the first worksheet's ``<sheetData>``, resolving
  sharedStrings (``t="s"``), inline strings (``t="inlineStr"``),
  formula caches (``t="str"``), booleans and numbers; sparse rows are
  densified from the ``r="BC12"`` cell references.
- **write**: inline-string cells (no sharedStrings part needed), a
  ``<cols>`` block for the reference's column-width styling, and the
  four mandatory package parts. Output opens in Excel/LibreOffice and
  round-trips through the reader bit-for-bit.

Driver-side by contract: callers hand in report-sized frames (rows ~
groups). The distributed path for real data volumes remains CSV or
parquet (``write_table``).
"""

from __future__ import annotations

import os
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    "</Types>"
)

_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)

_WORKBOOK_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns='
    '"http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    "</Relationships>"
)


def col_letter(idx: int) -> str:
    """1-based column index -> A..Z, AA.. letters."""
    s = ""
    while idx > 0:
        idx, r = divmod(idx - 1, 26)
        s = chr(65 + r) + s
    return s


def _col_index(ref: str) -> int:
    """Leading letters of an ``A1``-style reference -> 1-based index."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "s":
        return shared[int(v.text)] if v is not None and v.text is not None else None
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t"))
    if t == "b":
        return v is not None and v.text == "1"
    if t == "str":  # cached formula result
        return v.text if v is not None else None
    if v is None or v.text is None:
        return None
    txt = v.text
    if t == "n":
        return float(txt) if re.search(r"[.eE]", txt) else int(txt)
    # non-numeric cell kinds this codec doesn't model (t="e" error
    # cells, t="d" ISO dates): surface the raw text rather than crash
    # on a numeric parse — conform() casts or NULLs it downstream
    return txt


def read_rows(path: str) -> list[list]:
    """First worksheet -> dense row-major values (None for blanks).
    Row 1 is whatever the sheet has there — header handling is the
    caller's concern (``read_excel`` treats it as the header row)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_NS}si"):
                shared.append(
                    "".join(t.text or "" for t in si.iter(f"{_NS}t"))
                )
        sheets = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheets:
            raise ValueError(f"{path}: no worksheet part found")
        root = ET.fromstring(z.read(sheets[0]))
    rows: list[list] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        auto = 0
        for c in row.findall(f"{_NS}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else auto + 1
            auto = idx
            cells[idx] = _cell_value(c, shared)
        n = max(cells) if cells else 0
        rows.append([cells.get(i) for i in range(1, n + 1)])
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def _cell_xml(ref: str, v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
    if isinstance(v, (int, float)):
        return f'<c r="{ref}"><v>{v}</v></c>'
    return (
        f'<c r="{ref}" t="inlineStr"><is>'
        f'<t xml:space="preserve">{escape(str(v))}</t></is></c>'
    )


def write_rows(
    path: str,
    rows: list[list],
    *,
    sheet_name: str = "Sheet1",
    col_widths: list[float] | None = None,
) -> None:
    """Write rows (row 0 = header, by convention) as a one-sheet xlsx.
    ``col_widths`` maps 1:1 to columns; widths render as Excel
    ``customWidth`` column styling."""
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
    ]
    if col_widths:
        parts.append("<cols>")
        for i, w in enumerate(col_widths, 1):
            parts.append(
                f'<col min="{i}" max="{i}" width="{w}" customWidth="1"/>'
            )
        parts.append("</cols>")
    parts.append("<sheetData>")
    for rn, row in enumerate(rows, 1):
        parts.append(f'<row r="{rn}">')
        for cn, v in enumerate(row, 1):
            parts.append(_cell_xml(f"{col_letter(cn)}{rn}", v))
        parts.append("</row>")
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    workbook_xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns='
        '"http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
        'relationships"><sheets>'
        f'<sheet name={quoteattr(sheet_name)} sheetId="1" r:id="rId1"/>'
        "</sheets></workbook>"
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook_xml)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)


def read_col_widths(path: str) -> dict[int, float]:
    """Declared custom column widths of the first sheet (1-based)."""
    with zipfile.ZipFile(path) as z:
        sheets = sorted(
            n for n in z.namelist()
            if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)
        )
        if not sheets:
            raise ValueError(f"{path}: no worksheet part found")
        root = ET.fromstring(z.read(sheets[0]))
    out: dict[int, float] = {}
    for col in root.iter(f"{_NS}col"):
        w = col.get("width")
        if w is None:
            continue
        for i in range(int(col.get("min")), int(col.get("max")) + 1):
            out[i] = float(w)
    return out
