"""JATS (NLM journal XML) → DLDocument (SURVEY §2.1 S9, jats).

Behavior-parity reimplementation of the reference JatsDocumentBackend
(docling/docling/backend/xml/jats_backend.py:90-819) with stdlib
``xml.etree`` (lxml/bs4 absent): title from the title-group, author and
affiliation paragraphs, abstract section, recursive body/back walk with
section heading levels, figures as captioned picture placeholders,
table-wrap grids with th/td span accounting, element-citation flattening
(authors/title/source/volume:page/(year)/IDs) and mixed citations as
reference list items, tex-math display formulas.

Verified byte-identical md+itxt against the reference's 3 JATS goldens
(tests/test_formats.py).
"""

from __future__ import annotations

import re
from xml.etree import ElementTree as ET

from docling_plus_spark.doc.document import DLDocument, TableCellModel, TableData
from docling_plus_spark.html.backend import binary_hash_of

_JATS_DTD_KEYWORDS = ("JATS-journalpublishing", "JATS-archive")
_HEADER_ABSTRACT = "Abstract"
_HEADER_ACK = "Acknowledgments"
_HEADER_REFERENCES = "References"
_TEXT_ETAL = "et al."

_GET_TEXT_SKIP = ("term", "disp-formula", "inline-formula")


def _nl(s: str | None) -> str:
    return s.replace("\n", " ") if s else ""


def _get_text(node) -> str:
    """jats_backend.py:175-190 — recursive text, skipping formulas/terms."""
    text = _nl(node.text) if node.tag not in _GET_TEXT_SKIP else ""
    for child in list(node):
        if child.tag not in _GET_TEXT_SKIP:
            text += _get_text(child)
        text += _nl(child.tail)
    return text


def _cell_spans(cell) -> tuple:
    def _parse(attr: str) -> int:
        val = cell.get(attr)
        if val is None:
            return 1
        m = re.search(r"\d+", val)
        return int(m.group()) if m else 1

    return _parse("colspan"), _parse("rowspan")


def _cell_text(cell) -> str:
    """HTMLDocumentBackend.get_text semantics: trailing space after p/li,
    inline formulas become $$...$$."""

    def rec(el) -> str:
        if el.tag == "inline-formula":
            parts = (el.itertext() and "".join(el.itertext()) or "").split("$$")
            return f"$${parts[1]}$$" if len(parts) == 3 else ""
        s = el.text or ""
        for ch in list(el):
            s += rec(ch)
            s += ch.tail or ""
        return s + " " if el.tag in ("p", "li") else s

    s = cell.text or ""
    for ch in list(cell):
        s += rec(ch)
        s += ch.tail or ""
    return s.strip()


def _parse_table_data(table):
    """jats_backend.py:541-643 — span-aware grid from tr/th/td."""
    if table.find(".//table") is not None:
        return None
    rows = table.findall(".//tr")
    num_rows = num_cols = 0
    for tr in rows:
        col_count = 0
        is_row_header = True
        for cell in list(tr):
            if cell.tag not in ("td", "th"):
                continue
            col_span, row_span = _cell_spans(cell)
            col_count += col_span
            if cell.tag == "td" or row_span == 1:
                is_row_header = False
        num_cols = max(num_cols, col_count)
        if not is_row_header:
            num_rows += 1

    grid = [[None for _ in range(num_cols)] for _ in range(num_rows)]
    data = TableData(num_rows=num_rows, num_cols=num_cols, table_cells=[])
    start_row_span = 0
    row_idx = -1
    for tr in rows:
        cells = [c for c in list(tr) if c.tag in ("td", "th")]
        col_header = True
        row_header = True
        for cell in cells:
            _, row_span = _cell_spans(cell)
            if cell.tag == "td":
                col_header = False
                row_header = False
            elif row_span == 1:
                row_header = False
        if not row_header:
            row_idx += 1
            start_row_span = 0
        else:
            start_row_span += 1

        col_idx = 0
        for cell in cells:
            text = _cell_text(cell)
            col_span, row_span = _cell_spans(cell)
            if row_header:
                row_span -= 1
            while (
                col_idx < num_cols
                and grid[row_idx + start_row_span][col_idx] is not None
            ):
                col_idx += 1
            for r in range(start_row_span, start_row_span + row_span):
                for c in range(col_span):
                    if row_idx + r < num_rows and col_idx + c < num_cols:
                        grid[row_idx + r][col_idx + c] = text
            data.table_cells.append(
                TableCellModel(
                    text=text, row_span=row_span, col_span=col_span,
                    start_row_offset_idx=start_row_span + row_idx,
                    end_row_offset_idx=start_row_span + row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=col_header,
                    row_header=(not col_header) and cell.tag == "th",
                )
            )
    return data


class _JatsParser:
    def __init__(self, tree, doc: DLDocument):
        self.tree = tree
        self.doc = doc
        self.root = None
        self.hlevel = 0

    # -- metadata (jats_backend.py:192-345, 708-714) ------------------------
    def _meta_node(self):
        for name in ("article-meta", "book-part-meta"):
            node = self.tree.find(f".//{name}")
            if node is not None:
                return node
        return None

    def _parse_title(self) -> str:
        titles = []
        title_names = ("article-title", "subtitle", "title", "label")
        for meta in ("article-meta", "collection-meta", "book-meta", "book-part-meta"):
            for tg in self.tree.findall(f".//{meta}/title-group"):
                titles.append(
                    " ".join(
                        _nl(el.text).strip()
                        for el in list(tg)
                        if el.tag in title_names
                    ).strip()
                )
        return " - ".join(titles)

    def _add_metadata(self) -> None:
        self.root = self.doc.add_text(label="title", text=self._parse_title())

        meta = self._meta_node()
        authors, affiliations = [], []
        if meta is not None:
            aff_by_id = {}
            for aff in meta.findall(".//aff[@id]"):
                text = ", ".join(t for t in aff.itertext() if t.strip())
                text = text.replace("\n", " ")
                label = aff.find("label")
                if label is not None:
                    text = text.removeprefix(f"{label.text}, ")
                aff_by_id[aff.get("id")] = text
            for contrib in meta.findall(
                './/contrib-group/contrib[@contrib-type="author"]'
            ):
                given = contrib.find("name/given-names")
                surname = contrib.find("name/surname")
                if given is None or surname is None:
                    continue
                authors.append(f"{given.text} {surname.text}")
                for xref in contrib.findall('xref[@ref-type="aff"]'):
                    rid = xref.get("rid")
                    if rid in aff_by_id:
                        affiliations.append(aff_by_id[rid])
        if authors:
            self.doc.add_text(
                label="paragraph", text=", ".join(authors), parent=self.root
            )
        affiliations = list(dict.fromkeys(affiliations))
        if affiliations:
            self.doc.add_text(
                label="paragraph", text="; ".join(affiliations), parent=self.root
            )

        for abs_node in self.tree.findall(".//abstract"):
            texts = [
                _get_text(p).strip() for p in abs_node.findall("p")
            ]
            content = " ".join(texts)
            if not content:
                continue
            label = abs_node.find("title")
            if label is None:
                label = abs_node.find("label")
            title = (label.text.strip() if label is not None and label.text else "") \
                or _HEADER_ABSTRACT
            parent = self.doc.add_heading(
                text=title, level=self.hlevel + 1, parent=self.root
            )
            self.doc.add_text(label="text", text=content, parent=parent)

    # -- citations (jats_backend.py:355-480) ---------------------------------
    def _flatten_citation(self, node) -> str:
        names = []
        for name_node in node.findall(".//name"):
            sn, gn = name_node.find("surname"), name_node.find("given-names")
            if sn is not None and gn is not None:
                names.append(f"{_nl(sn.text).strip()} {_nl(gn.text).strip()}")
        etal = node.find(".//etal")
        if etal is not None:
            names.append(etal.text or _TEXT_ETAL)
        author_names = ", ".join(names)

        title = ""
        for tname in (
            "article-title", "chapter-title", "data-title", "issue-title",
            "part-title", "trans-title",
        ):
            tnode = node.find(tname)
            if tnode is not None:
                title = _get_text(tnode)
                break
        else:
            title = _nl(node.text).strip()

        fields = {}
        for item in ("source", "year", "publisher-name", "publisher-loc", "volume"):
            el = node.find(item)
            fields[item] = _nl(el.text).strip() if el is not None and el.text else ""

        pub_ids = []
        for id_node in node.findall("pub-id"):
            id_type = id_node.get("assigning-authority") or id_node.get("pub-id-type")
            if id_type and id_node.text:
                pub_ids.append(
                    f"{_nl(id_type).strip().upper()}: {_nl(id_node.text).strip()}"
                )
        pub_id = ", ".join(pub_ids)

        page = ""
        eloc = node.find("elocation-id")
        fpage = node.find("fpage")
        if eloc is not None and eloc.text:
            page = _nl(eloc.text).strip()
        elif fpage is not None and fpage.text:
            page = _nl(fpage.text).strip()
            lpage = node.find("lpage")
            if lpage is not None and lpage.text:
                page += "–" + _nl(lpage.text).strip()  # noqa: RUF001 — en dash

        text = ""
        if author_names:
            text += author_names.rstrip(".") + ". "
        if title:
            text += title + ". "
        if fields["source"]:
            text += fields["source"] + ". "
        if fields["publisher-name"]:
            if fields["publisher-loc"]:
                text += f"{fields['publisher-loc']}: "
            text += fields["publisher-name"] + ". "
        if fields["volume"]:
            text = text.rstrip(". ")
            text += f" {fields['volume']}. "
        if page:
            text = text.rstrip(". ")
            if fields["volume"]:
                text += ":"
            text += page + ". "
        if fields["year"]:
            text = text.rstrip(". ")
            text += f" ({fields['year']})."
        if pub_id:
            text = text.rstrip(".") + ". "
            text += pub_id
        return text

    def _add_citation(self, parent, text: str) -> None:
        if parent is not None and getattr(parent, "label", "") == "list":
            self.doc.add_list_item(text=text, enumerated=False, parent=parent)
        else:
            self.doc.add_text(label="text", text=text, parent=parent)

    # -- figures / tables (jats_backend.py:492-524, 644-706) -----------------
    def _caption_of(self, node) -> str:
        label_node = node.find("label")
        label = _get_text(label_node).strip() if label_node is not None else ""
        caption_node = node.find("caption")
        caption = None
        if caption_node is not None:
            caption = ""
            for par in list(caption_node):
                if par.find(".//supplementary-material") is not None:
                    continue
                caption += _get_text(par).strip() + " "
            caption = caption.strip()
        return f"{label}{' ' if label and caption else ''}{caption if caption else ''}"

    def _add_figure(self, parent, node) -> None:
        fig_text = self._caption_of(node)
        caption = (
            self.doc.add_text(label="caption", text=fig_text) if fig_text else None
        )
        self.doc.add_picture(parent=parent, caption=caption)

    def _add_table_wrap(self, parent, node) -> None:
        table = node.find("table")
        if table is None:
            table = node.find("alternatives/table")
        table_text = self._caption_of(node)
        caption = (
            self.doc.add_text(label="caption", text=table_text)
            if table_text
            else None
        )
        if table is None:
            return
        try:
            data = _parse_table_data(table)
        except Exception:  # noqa: BLE001 — unsupported table skipped
            return
        if data is not None:
            self.doc.add_table(data=data, parent=parent, caption=caption)

    # -- body walk (jats_backend.py:716-819) ----------------------------------
    def walk(self, parent, node, parent_tag: str = "") -> str:
        flush_tags = ("ack", "sec", "list", "boxed-text", "disp-formula", "fig")
        new_parent = node_text = None
        new_parent = parent
        node_text = _nl(node.text) if node.tag != "term" else ""

        for child in list(node):
            stop_walk = False
            text = None
            if node.tag == "p" and node_text.strip() and child.tag in flush_tags:
                self.doc.add_text(
                    label="text", text=node_text.strip(), parent=parent
                )
                node_text = ""

            if child.tag in ("sec", "ack"):
                header = child.find("title")
                if header is None:
                    header = child.find("label")
                if header is not None:
                    text = _get_text(header)
                elif child.tag == "ack":
                    text = _HEADER_ACK
                if text:
                    self.hlevel += 1
                    new_parent = self.doc.add_heading(
                        text=text, parent=parent, level=self.hlevel
                    )
            elif child.tag == "list":
                new_parent = self.doc.add_list_group(parent=parent)
            elif child.tag == "list-item":
                self.doc.add_list_item(
                    text=_get_text(child).strip(), parent=parent
                )
                stop_walk = True
            elif child.tag == "fig":
                self._add_figure(parent, child)
                stop_walk = True
            elif child.tag == "table-wrap":
                self._add_table_wrap(parent, child)
                stop_walk = True
            elif child.tag == "suplementary-material":  # (sic — reference typo)
                stop_walk = True
            elif child.tag == "fn-group":
                stop_walk = True
            elif child.tag == "ref-list" and node.tag != "ref-list":
                header = child.find("title")
                if header is None:
                    header = child.find("label")
                text = _get_text(header) if header is not None else _HEADER_REFERENCES
                new_parent = self.doc.add_heading(text=text, parent=parent)
                new_parent = self.doc.add_list_group(parent=new_parent)
            elif child.tag == "element-citation":
                self._add_citation(parent, self._flatten_citation(child))
                stop_walk = True
            elif child.tag == "mixed-citation":
                self._add_citation(parent, _get_text(child).strip())
                stop_walk = True
            elif child.tag == "tex-math":
                parts = (child.text or "").split("$$")
                if len(parts) == 3:
                    self.doc.add_text(label="formula", text=parts[1], parent=parent)
                stop_walk = True
            elif child.tag == "inline-formula":
                stop_walk = True

            if not stop_walk:
                new_text = self.walk(new_parent, child, parent_tag=node.tag)
                if not (parent_tag == "p" and node.tag in flush_tags):
                    node_text += new_text
                if child.tag in ("sec", "ack") and text:
                    self.hlevel -= 1
            node_text += _nl(child.tail)

        if node.tag == "p" and node_text.strip():
            self.doc.add_text(label="text", text=node_text.strip(), parent=parent)
            return ""
        return node_text


def convert_jats(data: bytes, name: str = "file", filename: str = "file.nxml") -> DLDocument:
    head = data[:4096].decode("utf-8", "replace")
    if not any(kwd in head for kwd in _JATS_DTD_KEYWORDS):
        raise ValueError("not a JATS document (no JATS DTD reference)")
    tree = ET.fromstring(data)
    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="application/xml",
    )
    # golden-vintage pin: the reference's JATS md goldens predate the
    # '>'-escape removal in docling-core's markdown serializer (see
    # _escape_md in doc/serializers.py)
    doc.md_escape_gt = True
    parser = _JatsParser(tree, doc)
    parser._add_metadata()
    body = tree.find(".//body")
    if body is not None:
        parser.walk(parser.root, body)
    back = tree.find(".//back")
    if back is not None:
        parser.walk(parser.root, back)
    return doc
