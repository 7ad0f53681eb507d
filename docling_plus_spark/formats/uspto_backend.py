"""USPTO patent documents → DLDocument (SURVEY §2.1 S9, uspto subset).

Behavior-parity reimplementation of the reference's APS parser
(docling/docling/backend/xml/uspto_backend.py:848-1062,
PatentUsptoGrantAps) — the Patent Grant Full Text/APS plain-text format
(1976-2001): two-column key/value records split on 2+ spaces, ABST/CLMS
sections as ABSTRACT/CLAIMS headings, PAC captions as sibling headings,
PAR/PA1-3 paragraphs, claim NUM/PAR accumulation, ``##STRn##``
continuation lines dropped.

The reference's three XML patent formats (ICE grant/application v4,
Grant v2, AppV1 — uspto_backend.py:167-1905) are SAX parsers over
1,900 LoC of format-specific state; they are inventoried but not ported
(documented subset). XML patent rows fail with a parse-failure status.

Verified byte-identical md+itxt against the reference's pftaps golden
(tests/test_formats.py).
"""

from __future__ import annotations

import re

from docling_plus_spark.doc.document import DLDocument
from docling_plus_spark.html.backend import binary_hash_of

_SECTION_ABSTRACT = "ABST"
_SECTION_SUMMARY = "BSUM"
_SECTION_DETAILS = "DETD"
_SECTION_CLAIMS = "CLMS"
_SECTION_DRAWINGS = "DRWD"

_HEADING_TEXT = {_SECTION_ABSTRACT: "ABSTRACT", _SECTION_CLAIMS: "CLAIMS"}
_HEADING_LEVEL = 2  # PatentHeading.ABSTRACT/CLAIMS (uspto_backend.py:43-58)

_PARAGRAPH_FIELDS = ("PAR", "PA1", "PA2", "PA3")
_KNOWN_FIELDS = {
    "WKU", "TTL", "PAR", "PA1", "PA2", "PA3", "PAL", "PAC", "NUM", "NAM",
    "ICL", "ISD", "APD", "PNO", "APN", "APT", "CNT",
}


class _ApsParser:
    def __init__(self, doc: DLDocument):
        self.doc = doc
        self.level = 1
        self.parents: dict = {1: None}

    def _last_text_item(self):
        parent = self.parents[self.level]
        children = parent.children if parent is not None else []
        texts = [t for t in self.doc.texts if t.self_ref in children]
        return texts[-1] if texts else None

    def store_section(self, section: str) -> None:
        if section not in _HEADING_TEXT:
            return
        self.level = _HEADING_LEVEL if _HEADING_LEVEL in self.parents else 1
        self.parents[self.level + 1] = self.doc.add_heading(
            text=_HEADING_TEXT[section], level=self.level,
            parent=self.parents[self.level],
        )
        self.level += 1

    def store_content(self, section: str, field: str, value: str) -> None:
        if not field or field not in _KNOWN_FIELDS:
            return
        if field == "TTL":
            self.parents[self.level + 1] = self.doc.add_title(
                text=value, parent=self.parents[self.level]
            )
            self.level += 1
        elif field == "PAL" and section == _SECTION_ABSTRACT:
            last = self._last_text_item()
            if last:
                last.text += " " + value
            else:
                self.doc.add_text(
                    label="paragraph", text=value, parent=self.parents[self.level]
                )
        elif field == "NUM" and section == _SECTION_CLAIMS:
            self.doc.add_text(
                label="paragraph", text="", parent=self.parents[self.level]
            )
        elif field in _PARAGRAPH_FIELDS and section == _SECTION_CLAIMS:
            last = self._last_text_item()
            if last is None:
                last = self.doc.add_text(
                    label="paragraph", text="", parent=self.parents[self.level]
                )
            last.text += f" {value.strip()}" if last.text else value.strip()
        elif field == "PAC" and section in (
            _SECTION_SUMMARY, _SECTION_DETAILS, _SECTION_DRAWINGS
        ):
            # captions become sibling headings of ABSTRACT
            self.level = _HEADING_LEVEL if _HEADING_LEVEL in self.parents else 1
            self.parents[self.level + 1] = self.doc.add_heading(
                text=value, level=self.level, parent=self.parents[self.level]
            )
            self.level += 1
        elif field in _PARAGRAPH_FIELDS and section in (
            _SECTION_SUMMARY, _SECTION_DETAILS, _SECTION_DRAWINGS
        ):
            self.doc.add_text(
                label="paragraph", text=value, parent=self.parents[self.level]
            )

    def parse(self, content: str) -> None:
        section = key = value = ""
        for line in content.splitlines():
            cols = re.split(r"\s{2,}", line, maxsplit=1)
            if key and value and (len(cols) == 1 or (len(cols) == 2 and cols[0])):
                self.store_content(section, key, value)
                key = value = ""
            if len(cols) == 1:
                section = cols[0]
                self.store_section(section)
            elif len(cols) == 2:
                if cols[0]:
                    key, value = cols
                elif not re.match(r"^##STR\d+##$", cols[1]):
                    value += " " + cols[1]
        if key and value:
            self.store_content(section, key, value)


def convert_uspto(data: bytes, name: str = "file", filename: str = "file.txt") -> DLDocument:
    content = data.decode("utf-8")
    first_line = content.split("\n", 1)[0]
    if first_line.rstrip("\r") != "PATN":
        raise ValueError(
            "unsupported USPTO format (only the APS plain-text form is "
            "implemented; XML patent formats are inventoried, not ported)"
        )
    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="text/plain",
    )
    _ApsParser(doc).parse(content)
    return doc
