"""PPTX → DLDocument (SURVEY §2.1 S9, pptx).

Behavior-parity reimplementation of the reference
MsPowerpointDocumentBackend (docling/docling/backend/
mspowerpoint_backend.py:86-398) with stdlib ``zipfile`` + ``xml.etree``
(python-pptx is absent in this sandbox): slides become CHAPTER groups in
presentation order; per shape, bullet/auto-numbered/indented paragraphs
become one list group (enumeration counter per shape), title/ctrTitle
placeholders become the title (the reference's subtitle branch is a
no-op bug — mirrored), other text becomes PARAGRAPH items; a:tbl grids
keep only non-empty cells with rowSpan/gridSpan; p:pic becomes a picture
placeholder; p:grpSp recurses. Notes slides are furniture text.

Verified byte-identical md+itxt against the reference pptx goldens
(tests/test_formats.py).
"""

from __future__ import annotations

import re
import zipfile
from io import BytesIO
from xml.etree import ElementTree as ET

from docling_plus_spark.doc.document import DLDocument, TableCellModel, TableData
from docling_plus_spark.html.backend import binary_hash_of

_P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


def _para_text(p) -> str:
    """a:p → text: runs + fields concatenated, line breaks become spaces
    (reference :155-161)."""
    parts = []
    for child in p:
        tag = child.tag
        if tag in (_A + "r", _A + "fld"):
            t = child.find(_A + "t")
            parts.append(t.text or "" if t is not None else "")
        elif tag == _A + "br":
            parts.append(" ")
    return "".join(parts)


def _frame_text(tx_body) -> str:
    """python-pptx text_frame.text: paragraphs joined with newlines."""
    return "\n".join(_para_text(p) for p in tx_body.findall(_A + "p"))


def _is_list_item(p) -> tuple:
    if p.find(f".//{_A}buChar") is not None:
        return True, "Bullet"
    if p.find(f".//{_A}buAutoNum") is not None:
        return True, "Numbered"
    ppr = p.find(_A + "pPr")
    level = int(ppr.get("lvl", "0")) if ppr is not None else 0
    if level > 0:
        return True, "None"
    return False, "None"


class _PptxWalker:
    def __init__(self, doc: DLDocument):
        self.doc = doc

    def _handle_text(self, sp, parent_slide) -> None:
        tx_body = sp.find(f".//{_P}txBody") or sp.find(f".//{_A}txBody")
        if tx_body is None:
            return
        if not _frame_text(tx_body).strip():
            return
        ph = sp.find(f".//{_P}nvSpPr/{_P}nvPr/{_P}ph")
        is_title_ph = ph is not None and ph.get("type") in ("ctrTitle", "title")

        list_group = None
        enum_value = 0
        for p in tx_body.findall(_A + "p"):
            is_list, bullet_type = _is_list_item(p)
            p_text = _para_text(p)
            if is_list:
                if list_group is None:
                    list_group = self.doc.add_list_group(parent=parent_slide)
                    enum_value = 0
                enumerated = bullet_type == "Numbered"
                marker = ""
                if enumerated:
                    enum_value += 1
                    marker = f"{enum_value}."
                self.doc.add_list_item(
                    text=p_text, marker=marker, enumerated=enumerated,
                    parent=list_group,
                )
            else:
                label = "title" if is_title_ph else "paragraph"
                # NOTE: the reference's SUBTITLE branch is a bare statement
                # with no assignment (mspowerpoint_backend.py:200-201), so
                # subtitles also land as paragraphs — mirrored
                self.doc.add_text(label=label, text=p_text, parent=parent_slide)

    def _handle_table(self, tbl, parent_slide) -> None:
        rows = tbl.findall(f".//{_A}tr")
        num_rows = len(rows)
        num_cols = max((len(r.findall(_A + "tc")) for r in rows), default=0)
        cells = []
        for ri, tr in enumerate(rows):
            for ci, tc in enumerate(tr.findall(_A + "tc")):
                row_span = int(tc.get("rowSpan", "1"))
                col_span = int(tc.get("gridSpan", "1"))
                tx = tc.find(_A + "txBody")
                text = _frame_text(tx).strip() if tx is not None else ""
                if not text:
                    continue
                cells.append(
                    TableCellModel(
                        text=text, row_span=row_span, col_span=col_span,
                        start_row_offset_idx=ri, end_row_offset_idx=ri + row_span,
                        start_col_offset_idx=ci, end_col_offset_idx=ci + col_span,
                        column_header=ri == 0, row_header=False,
                    )
                )
        if cells:
            self.doc.add_table(
                data=TableData(
                    num_rows=num_rows, num_cols=num_cols, table_cells=cells
                ),
                parent=parent_slide,
            )

    def handle_shape(self, shape, parent_slide) -> None:
        tag = shape.tag
        if tag == _P + "grpSp":
            for sub in shape:
                if sub.tag in (_P + "sp", _P + "graphicFrame", _P + "pic", _P + "grpSp"):
                    self.handle_shape(sub, parent_slide)
            return
        tbl = shape.find(f".//{_A}tbl")
        if tbl is not None:
            self._handle_table(tbl, parent_slide)
        if tag == _P + "pic":
            self.doc.add_picture(parent=parent_slide)
        self._handle_text(shape, parent_slide)


def convert_pptx(data: bytes, name: str = "file", filename: str = "file.pptx") -> DLDocument:
    zf = zipfile.ZipFile(BytesIO(data))
    names = set(zf.namelist())
    if "ppt/presentation.xml" not in names:
        raise ValueError("not a PresentationML package")

    # slide order: sldIdLst r:id refs resolved through presentation rels
    pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    rels = {}
    if "ppt/_rels/presentation.xml.rels" in names:
        for rel in ET.fromstring(zf.read("ppt/_rels/presentation.xml.rels")):
            rels[rel.get("Id")] = rel.get("Target")
    slide_paths = []
    sld_lst = pres.find(_P + "sldIdLst")
    if sld_lst is not None:
        for sld in sld_lst.findall(_P + "sldId"):
            target = rels.get(sld.get(_R + "id"), "")
            if target:
                slide_paths.append("ppt/" + target.lstrip("/").removeprefix("ppt/"))

    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="application/vnd.ms-powerpoint",
    )
    walker = _PptxWalker(doc)
    for slide_ind, path in enumerate(slide_paths):
        if path not in names:
            continue
        slide = ET.fromstring(zf.read(path))
        parent_slide = doc.add_group(label="chapter", name=f"slide-{slide_ind}")
        sp_tree = slide.find(f".//{_P}cSld/{_P}spTree")
        if sp_tree is None:
            continue
        for shape in sp_tree:
            if shape.tag in (_P + "sp", _P + "graphicFrame", _P + "pic", _P + "grpSp"):
                walker.handle_shape(shape, parent_slide)
        # notes slide → furniture text (reference :380-398)
        rel_path = f"ppt/slides/_rels/{path.rsplit('/', 1)[-1]}.rels"
        if rel_path in names:
            for rel in ET.fromstring(zf.read(rel_path)):
                if rel.get("Type", "").endswith("/notesSlide"):
                    notes_path = "ppt/" + rel.get("Target", "").lstrip("/").replace(
                        "../", ""
                    )
                    if notes_path in names:
                        notes = ET.fromstring(zf.read(notes_path))
                        texts = [
                            _frame_text(tb)
                            for tb in notes.iter(_P + "txBody")
                        ]
                        note_text = "\n".join(t for t in texts if t).strip()
                        if note_text:
                            doc.add_text(
                                label="text", text=note_text,
                                parent=parent_slide, content_layer="furniture",
                            )
    return doc
