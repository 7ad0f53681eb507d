"""XLSX → DLDocument (SURVEY §2.1 S9, xlsx).

Behavior-parity reimplementation of the reference MsExcelDocumentBackend
(docling/docling/backend/msexcel_backend.py:188-678) with stdlib
``zipfile`` + ``xml.etree`` (openpyxl is absent in this sandbox): one
SECTION group per sheet ("sheet: <name>", hidden sheets → furniture),
compact rectangular data-table detection (true data bounds → row-major
scan → contiguous bottom/right growth with merged-range expansion),
merged cells as row/col spans, interior empty cells rendered ``str(None)``
exactly like the reference, images as picture placeholders, chartsheets
as empty groups.

Verified byte-identical md+itxt against the reference xlsx goldens
(tests/test_formats.py).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from docling_plus_spark.doc.document import DLDocument, TableCellModel, TableData
from docling_plus_spark.html.backend import binary_hash_of

_S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_XDR = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_to_int(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n


def _parse_ref(ref: str) -> tuple:
    m = _CELL_REF_RE.match(ref)
    return int(m.group(2)), _col_to_int(m.group(1))  # (row, col), 1-based


_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))
_DATE_TOKEN_RE = re.compile(r"(?<!\\)[ymdhs]", re.IGNORECASE)


def _is_date_format(fmt_id: int, code: str | None) -> bool:
    if fmt_id in _BUILTIN_DATE_FMTS:
        return True
    if code:
        # strip quoted literals and bracket sections before token scan
        bare = re.sub(r'"[^"]*"|\[[^\]]*\]', "", code)
        return bool(_DATE_TOKEN_RE.search(bare))
    return False


def _serial_to_datetime(serial: float):
    """Excel 1900-system serial → datetime (openpyxl semantics)."""
    from datetime import datetime, timedelta

    return datetime(1899, 12, 30) + timedelta(days=serial)


def _cell_value(c, shared: list, date_styles: frozenset = frozenset()):
    """Typed cell value the way openpyxl reports it
    (int/float/str/bool/datetime)."""
    t = c.get("t", "n")
    if t == "inlineStr":
        parts = [el.text or "" for el in c.findall(f".//{_S}t")]
        return "".join(parts)
    v = c.find(_S + "v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        idx = int(raw)
        return shared[idx] if 0 <= idx < len(shared) else None
    if t == "b":
        return raw == "1"
    if t == "str":
        return raw
    if t == "e":
        return raw  # error literal like #DIV/0!
    # numeric: date-styled serials become datetimes (openpyxl behavior)
    if c.get("s") is not None and int(c.get("s")) in date_styles:
        try:
            return _serial_to_datetime(float(raw))
        except ValueError:
            pass
    # openpyxl yields int for integral literals, float otherwise
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    try:
        f = float(raw)
    except ValueError:
        return raw
    return int(f) if f.is_integer() and "e" not in raw.lower() else f


class _Sheet:
    def __init__(self, name: str, root, hidden: bool):
        self.name = name
        self.hidden = hidden
        self.cells: dict = {}  # (row, col) 1-based -> value
        self.merged: list = []  # (min_row, min_col, max_row, max_col)
        self.root = root

    def value(self, row: int, col: int):
        return self.cells.get((row, col))

    def merged_at(self, row: int, col: int):
        for mr in self.merged:
            if mr[0] <= row <= mr[2] and mr[1] <= col <= mr[3]:
                return mr
        return None


def _load_sheet(
    name: str, xml: bytes, hidden: bool, shared: list,
    date_styles: frozenset = frozenset(),
) -> _Sheet:
    root = ET.fromstring(xml)
    sheet = _Sheet(name, root, hidden)
    for c in root.iter(_S + "c"):
        ref = c.get("r")
        if not ref:
            continue
        val = _cell_value(c, shared, date_styles)
        if val is not None:
            sheet.cells[_parse_ref(ref)] = val
    for mc in root.iter(_S + "mergeCell"):
        ref = mc.get("ref", "")
        if ":" in ref:
            a, b = ref.split(":")
            (r1, c1), (r2, c2) = _parse_ref(a), _parse_ref(b)
            sheet.merged.append((r1, c1, r2, c2))
    return sheet


def _true_bounds(sheet: _Sheet) -> tuple:
    """msexcel_backend.py:366-406 — smallest rectangle over data+merges."""
    min_row = min_col = None
    max_row = max_col = 0
    for (r, c) in sheet.cells:
        min_row = r if min_row is None else min(min_row, r)
        min_col = c if min_col is None else min(min_col, c)
        max_row, max_col = max(max_row, r), max(max_col, c)
    for (r1, c1, r2, c2) in sheet.merged:
        min_row = r1 if min_row is None else min(min_row, r1)
        min_col = c1 if min_col is None else min(min_col, c1)
        max_row, max_col = max(max_row, r2), max(max_col, c2)
    if min_row is None:
        return 1, 1, 1, 1
    return min_row, max_row, min_col, max_col


def _table_bottom(sheet: _Sheet, start_row: int, start_col: int, max_row: int) -> int:
    """Grow down along the first column (:528-570). 0-based in/out."""
    table_max_row = start_row
    for ri in range(start_row + 1, max_row):
        mr = sheet.merged_at(ri + 1, start_col + 1)
        if sheet.value(ri + 1, start_col + 1) is None and not mr:
            break
        if mr:
            table_max_row = max(table_max_row, mr[2] - 1)
        else:
            table_max_row = ri
    return table_max_row


def _table_right(sheet: _Sheet, start_row: int, start_col: int, max_col: int) -> int:
    """Grow right along the first row (:571-613). 0-based in/out."""
    table_max_col = start_col
    for rj in range(start_col + 1, max_col):
        mr = sheet.merged_at(start_row + 1, rj + 1)
        if sheet.value(start_row + 1, rj + 1) is None and not mr:
            break
        if mr:
            table_max_col = max(table_max_col, mr[3] - 1)
        else:
            table_max_col = rj
    return table_max_col


def _find_tables(sheet: _Sheet) -> list:
    """Row-major scan for compact tables (:408-527). Cells 0-based."""
    min_row, max_row, min_col, max_col = _true_bounds(sheet)
    tables = []
    visited: set = set()
    for ri in range(min_row - 1, max_row):
        for rj in range(min_col - 1, max_col):
            if sheet.value(ri + 1, rj + 1) is None or (ri, rj) in visited:
                continue
            t_max_row = _table_bottom(sheet, ri, rj, max_row)
            t_max_col = _table_right(sheet, ri, rj, max_col)
            data = []
            cell_visited: set = set()
            for i in range(ri, t_max_row + 1):
                for j in range(rj, t_max_col + 1):
                    row_span = col_span = 1
                    mr = sheet.merged_at(i + 1, j + 1)
                    if mr:
                        row_span = mr[2] - mr[0] + 1
                        col_span = mr[3] - mr[1] + 1
                    if (i, j) not in cell_visited:
                        data.append(
                            {
                                "row": i - ri, "col": j - rj,
                                "text": str(sheet.value(i + 1, j + 1)),
                                "row_span": row_span, "col_span": col_span,
                            }
                        )
                        for si in range(i, i + row_span):
                            for sj in range(j, j + col_span):
                                cell_visited.add((si, sj))
            visited.update(cell_visited)
            tables.append(
                {
                    "num_rows": t_max_row + 1 - ri,
                    "num_cols": t_max_col + 1 - rj,
                    "data": data,
                }
            )
    return tables


def convert_xlsx(data: bytes, name: str = "file", filename: str = "file.xlsx") -> DLDocument:
    zf = zipfile.ZipFile(BytesIO(data))
    names = set(zf.namelist())
    if "xl/workbook.xml" not in names:
        raise ValueError("not a SpreadsheetML package")
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = {}
    if "xl/_rels/workbook.xml.rels" in names:
        for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels")):
            rels[rel.get("Id")] = rel.get("Target")
    shared: list = []
    if "xl/sharedStrings.xml" in names:
        for si in ET.fromstring(zf.read("xl/sharedStrings.xml")).findall(_S + "si"):
            shared.append("".join(t.text or "" for t in si.iter(_S + "t")))
    # style indices whose number format is a date/time format
    date_styles: set = set()
    if "xl/styles.xml" in names:
        styles = ET.fromstring(zf.read("xl/styles.xml"))
        custom = {
            int(nf.get("numFmtId")): nf.get("formatCode")
            for nf in styles.iter(_S + "numFmt")
        }
        xfs = styles.find(_S + "cellXfs")
        for i, xf in enumerate(xfs.findall(_S + "xf") if xfs is not None else []):
            fmt_id = int(xf.get("numFmtId", "0"))
            if _is_date_format(fmt_id, custom.get(fmt_id)):
                date_styles.add(i)

    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="application/vnd.ms-excel",
    )
    sheets_el = wb.find(_S + "sheets")
    for sh in (sheets_el.findall(_S + "sheet") if sheets_el is not None else []):
        sheet_name = sh.get("name", "")
        hidden = sh.get("state") in ("hidden", "veryHidden")
        target = rels.get(sh.get(_R + "id"), "") or ""
        target = "xl/" + target.lstrip("/").removeprefix("xl/")
        layer = "furniture" if hidden else "body"
        group = doc.add_group(
            label="section", name=f"sheet: {sheet_name}", content_layer=layer
        )
        if "chartsheets/" in target or target not in names:
            continue  # chartsheet: group only (reference parses no charts)
        sheet = _load_sheet(
            sheet_name, zf.read(target), hidden, shared, frozenset(date_styles)
        )
        for t in _find_tables(sheet):
            td = TableData(
                num_rows=t["num_rows"], num_cols=t["num_cols"], table_cells=[]
            )
            for c in t["data"]:
                td.table_cells.append(
                    TableCellModel(
                        text=c["text"], row_span=c["row_span"],
                        col_span=c["col_span"],
                        start_row_offset_idx=c["row"],
                        end_row_offset_idx=c["row"] + c["row_span"],
                        start_col_offset_idx=c["col"],
                        end_col_offset_idx=c["col"] + c["col_span"],
                        column_header=c["row"] == 0, row_header=False,
                    )
                )
            doc.add_table(data=td, parent=group, content_layer=layer)
        # images: the sheet's drawing part contributes picture placeholders
        sheet_rel = (
            f"xl/worksheets/_rels/{target.rsplit('/', 1)[-1]}.rels"
        )
        if sheet_rel in names:
            for rel in ET.fromstring(zf.read(sheet_rel)):
                if rel.get("Type", "").endswith("/drawing"):
                    draw_path = "xl/" + rel.get("Target", "").lstrip("/").replace(
                        "../", ""
                    )
                    if draw_path in names:
                        drawing = ET.fromstring(zf.read(draw_path))
                        for _pic in drawing.iter(_XDR + "pic"):
                            doc.add_picture(parent=group, content_layer=layer)
    return doc
