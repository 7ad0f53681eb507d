"""Markdown → DLDocument (SURVEY §2.1 S9, md-subset).

The reference parses Markdown with the marko CommonMark parser
(docling/docling/backend/md_backend.py:73, 614 LoC) — not available
here. This is a line-based subset covering the structures the extraction
pipeline needs from web-scale markdown: ATX headings, paragraphs,
bullet/ordered lists (one nesting level via indent), fenced code blocks,
and pipe tables. Inline emphasis is carried through as plain text.
NOT byte-parity with the reference's marko-based goldens — the honest
subset, documented as such.
"""

from __future__ import annotations

import re

from docling_plus_spark.doc.document import DLDocument, TableCellModel, TableData
from docling_plus_spark.html.backend import binary_hash_of

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BULLET_RE = re.compile(r"^(\s*)[-*+]\s+(.*)$")
_ORDERED_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^```(\w*)\s*$")
_TABLE_ROW_RE = re.compile(r"^\s*\|(.+)\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)+\|?\s*$")


def _flush_para(doc: DLDocument, buf: list) -> None:
    if buf:
        doc.add_text(label="text", text=" ".join(buf))
        buf.clear()


def convert_markdown(
    data: bytes, name: str = "file", filename: str = "file.md"
) -> DLDocument:
    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="text/markdown",
    )
    lines = data.decode("utf-8", "replace").split("\n")
    para: list = []
    open_list = None
    code_buf: list = []
    in_code = False
    table_buf: list = []

    def flush_table() -> None:
        nonlocal table_buf
        if not table_buf:
            return
        rows = [
            [c.strip() for c in m.group(1).split("|")]
            for m in (_TABLE_ROW_RE.match(ln) for ln in table_buf)
            if m
        ]
        seps = [i for i, ln in enumerate(table_buf) if _TABLE_SEP_RE.match(ln)]
        header_rows = 1 if seps else 0
        if header_rows:
            rows = [
                r for i, r in enumerate(rows) if i not in seps
            ]
        if rows:
            table = TableData(
                num_rows=len(rows), num_cols=max(len(r) for r in rows), table_cells=[]
            )
            for ri, row in enumerate(rows):
                for ci, val in enumerate(row):
                    table.table_cells.append(
                        TableCellModel(
                            text=val, start_row_offset_idx=ri,
                            end_row_offset_idx=ri + 1, start_col_offset_idx=ci,
                            end_col_offset_idx=ci + 1,
                            column_header=header_rows > 0 and ri == 0,
                        )
                    )
            doc.add_table(data=table)
        table_buf = []

    for line in lines:
        if in_code:
            if _FENCE_RE.match(line):
                doc.add_code(text="\n".join(code_buf))
                code_buf, in_code = [], False
            else:
                code_buf.append(line)
            continue
        fence = _FENCE_RE.match(line)
        if fence:
            _flush_para(doc, para)
            flush_table()
            open_list = None
            in_code = True
            continue
        if _TABLE_ROW_RE.match(line) or (_TABLE_SEP_RE.match(line) and table_buf):
            _flush_para(doc, para)
            open_list = None
            table_buf.append(line)
            continue
        flush_table()
        h = _HEADING_RE.match(line)
        if h:
            _flush_para(doc, para)
            open_list = None
            level = len(h.group(1))
            if level == 1:
                doc.add_title(text=h.group(2))
            else:
                doc.add_heading(text=h.group(2), level=level - 1)
            continue
        b = _BULLET_RE.match(line)
        o = _ORDERED_RE.match(line)
        if b or o:
            _flush_para(doc, para)
            if open_list is None:
                open_list = doc.add_list_group()
            if o:
                doc.add_list_item(
                    text=o.group(3), enumerated=True, marker=f"{o.group(2)}.",
                    parent=open_list,
                )
            else:
                doc.add_list_item(text=b.group(2), marker="-", parent=open_list)
            continue
        if not line.strip():
            _flush_para(doc, para)
            open_list = None
            continue
        open_list = None
        para.append(line.strip())
    _flush_para(doc, para)
    flush_table()
    if in_code and code_buf:
        doc.add_code(text="\n".join(code_buf))
    return doc
