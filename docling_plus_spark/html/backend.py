"""HTML → DLDocument conversion (main-content extraction core).

Behavior-parity reimplementation of the reference HTML backend
(``/root/reference/docling/docling/backend/html_backend.py``), written from
scratch over the stdlib DOM in :mod:`docling_plus_spark.dom` — no bs4, no
pydantic, no per-document I/O. One ``HtmlConverter.convert`` call handles one
document; the Spark stage calls it in a loop over every row of an Arrow
batch inside ``mapInPandas`` (vectorized *stage* granularity).

Key reference semantics reproduced (file:line cites for parity audit):
* boilerplate strip + hidden removal         html_backend.py:310-315
* <br> → newline                             html_backend.py:320-322
* paragraph-breaker DOM repair               html_backend.py:343-416
* furniture-before-first-heading rule        html_backend.py:325-341
* inline buffering / simplify / nl-split     html_backend.py:139-227,632-726
* heading stack with synthetic sections      html_backend.py:959-1023
* lists incl. ordered `start` markers        html_backend.py:1025-1153
* table span grid + rich cells               html_backend.py:480-630,1155-1178
* unicode cleanup table                      html_backend.py:1425-1463
* colspan/rowspan parsing                    html_backend.py:1465-1490
* URL resolution incl. protocol-relative     html_backend.py:418-438
"""

from __future__ import annotations

import hashlib
import re
from contextlib import contextmanager
from dataclasses import dataclass, replace
from pathlib import PurePosixPath
from typing import Optional
from urllib.parse import urlsplit, urlunsplit

from ..dom import NavString, Tag, parse_html
from ..doc.document import (
    ContentLayer,
    DLDocument,
    Formatting,
    TableCellModel,
    TableData,
    TableItem,
)

_BLOCK_TAGS = frozenset({
    "address", "details", "figure", "footer", "img",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ol", "p", "pre", "summary", "table", "ul",
})

_PARA_BREAKERS = frozenset({
    "address", "article", "aside", "blockquote", "div", "dl", "fieldset",
    "figcaption", "figure", "footer", "form",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "main", "nav", "ol", "ul", "li", "p", "pre", "section",
    "table", "thead", "tbody", "tfoot", "tr", "td",
})

_CODE_TAGS = frozenset({"code", "kbd", "samp"})

# insertion order matters: ancestor format tags are collected in this order
_FORMAT_TAG_MAP: dict = {
    "b": {"bold": True},
    "strong": {"bold": True},
    "i": {"italic": True},
    "em": {"italic": True},
    "var": {"italic": True},
    "s": {"strikethrough": True},
    "del": {"strikethrough": True},
    "u": {"underline": True},
    "ins": {"underline": True},
    "sub": {"script": "sub"},
    "sup": {"script": "super"},
    **{k: {} for k in _CODE_TAGS},
}

_HEADING_TAGS = ("h1", "h2", "h3", "h4", "h5", "h6")

_UNICODE_REPLACEMENTS = {
    " ": " ", "​": "", "‌": "", "‍": "",
    "‐": "-", "‑": "-", "‒": "-", "–": "-",
    "—": "-", "―": "-",
    "‘": "'", "’": "'", "“": '"', "”": '"',
    "…": "...", "­": "", "﻿": "", " ": " ",
    "⁠": "",
}
_UNICODE_RE = re.compile("|".join(map(re.escape, _UNICODE_REPLACEMENTS)))

_WS_RE = re.compile(r"\s+|\n+")

_SPECIAL_SCHEMES = {"http", "https", "ws", "wss", "ftp"}
_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443",
                  "ftp": "21"}


def clean_unicode(text: str) -> str:
    """19-entry unicode replacement table (html_backend.py:1425-1463)."""
    return _UNICODE_RE.sub(lambda m: _UNICODE_REPLACEMENTS[m.group(0)], text)


def binary_hash_of(data: bytes) -> int:
    """uint64 document hash: low 64 bits of sha-256 (utils/utils.py:19-44 +
    docling-core DocumentOrigin coercion, observed in the golden JSONs)."""
    return int.from_bytes(hashlib.sha256(data).digest()[-8:], "big")


def normalize_hyperlink(href: str) -> str:
    """Emulate pydantic-v2 ``AnyUrl`` normalization, falling back to the
    ``Path`` branch for scheme-less links (html_backend.py:840-845)."""
    try:
        parts = urlsplit(href)
    except ValueError:
        parts = None
    if parts is not None and parts.scheme and (parts.netloc or not href.startswith("//")):
        scheme = parts.scheme.lower()
        if scheme in _SPECIAL_SCHEMES or scheme == "file":
            netloc = parts.netloc
            host = parts.hostname or ""
            port = parts.port
            userinfo = ""
            if "@" in netloc:
                userinfo = netloc.rsplit("@", 1)[0] + "@"
            rebuilt = userinfo + host
            if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
                rebuilt += f":{port}"
            path = parts.path or "/"
            return urlunsplit((scheme, rebuilt, path, parts.query, parts.fragment))
        return href
    # Path(...) branch: POSIX path normalization
    text = str(PurePosixPath(href)) if href else href
    # PurePosixPath drops a trailing slash; pydantic's Path does the same
    return text


def resolve_hyperlink(href: str, base_path: Optional[str]) -> str:
    """URL resolution (html_backend.py:423-438) + AnyUrl/Path coercion.

    In the table pipeline ``base_path`` is the row's url; the reference CLI
    path runs with ``str(None)`` which leaves relative links untouched —
    pass ``base_path=None`` for golden parity."""
    abs_loc = href
    if href.startswith("//"):
        abs_loc = "https:" + href
    elif not href.startswith(("http://", "https://", "data:", "file://")):
        if base_path is not None and _is_remote_url(base_path):
            from urllib.parse import urljoin

            abs_loc = urljoin(base_path, href)
        # local-file branch of the reference resolves against the html file
        # directory; for 'None'/str paths this is a no-op for relative hrefs
    return normalize_hyperlink(abs_loc)


def _is_remote_url(value: str) -> bool:
    try:
        return urlsplit(value).scheme in {"http", "https", "ftp", "s3", "gs"}
    except ValueError:
        return False


@dataclass
class AnnotatedText:
    """Inline text run with its annotations (html_backend.py:132-137)."""

    text: str
    hyperlink: Optional[str] = None
    formatting: Optional[Formatting] = None
    code: bool = False


class AnnotatedTextList(list):
    """Run-length merging + newline splitting (html_backend.py:139-227)."""

    def to_single_text_element(self) -> AnnotatedText:
        current_h = None
        current_text = ""
        current_f = None
        current_code = False
        for at in self:
            current_text += at.text.strip() + " "
            if at.formatting is not None and current_f is None:
                current_f = at.formatting
            if at.hyperlink is not None and current_h is None:
                current_h = at.hyperlink
            current_code = at.code if at.code else current_code
        return AnnotatedText(
            text=current_text.strip(),
            hyperlink=current_h,
            formatting=current_f,
            code=current_code,
        )

    def simplify_text_elements(self) -> "AnnotatedTextList":
        simplified = AnnotatedTextList()
        if not self:
            return self
        text = self[0].text
        hyperlink = self[0].hyperlink
        formatting = self[0].formatting
        code = self[0].code
        last_elm = text
        for i in range(1, len(self)):
            cur = self[i]
            if (
                hyperlink == cur.hyperlink
                and formatting == cur.formatting
                and code == cur.code
            ):
                sep = " "
                if not cur.text.strip() or not last_elm.strip():
                    sep = ""
                text += sep + cur.text
                last_elm = cur.text
            else:
                simplified.append(
                    AnnotatedText(text=text, hyperlink=hyperlink,
                                  formatting=formatting, code=code)
                )
                text = cur.text
                last_elm = text
                hyperlink = cur.hyperlink
                formatting = cur.formatting
                code = cur.code
        if text:
            simplified.append(
                AnnotatedText(text=text, hyperlink=hyperlink,
                              formatting=formatting, code=code)
            )
        return simplified

    def split_by_newline(self) -> list:
        super_list: list[AnnotatedTextList] = []
        active = AnnotatedTextList()
        for el in self:
            sub_texts = el.text.split("\n")
            if len(sub_texts) == 1:
                active.append(el)
            else:
                for text in sub_texts:
                    active.append(replace(el, text=text))
                    super_list.append(active)
                    active = AnnotatedTextList()
        if active:
            super_list.append(active)
        return super_list


class HtmlConverter:
    """One-document HTML → DLDocument state machine."""

    MAX_LEVELS = 10

    def __init__(self, base_path: Optional[str] = None):
        self.base_path = base_path
        self._reset()

    def _reset(self) -> None:
        self.level = 0
        self.parents: dict[int, Optional[object]] = {
            i: None for i in range(self.MAX_LEVELS)
        }
        self.content_layer = ContentLayer.BODY
        self.hyperlink: Optional[str] = None
        self.format_tags: list[str] = []
        self.list_ordered_by_ref: dict[str, bool] = {}
        self.list_start_by_ref: dict[str, int] = {}

    # ------------------------------------------------------------------ main
    def convert(
        self,
        data: bytes,
        name: str = "file",
        filename: str = "file",
    ) -> DLDocument:
        self._reset()
        if isinstance(data, str):
            data = data.encode("utf-8")
        doc = DLDocument(
            name=name, filename=filename, binary_hash=binary_hash_of(data)
        )
        root = parse_html(data)

        # <title> → furniture title (html_backend.py:300-309)
        title = root.find("title")
        if title is not None:
            title_text = title.get_text(separator=" ", strip=True)
            doc.add_title(
                text=clean_unicode(title_text),
                orig=title_text,
                content_layer=ContentLayer.FURNITURE,
            )
        # strip scripts/styles and hidden subtrees (html_backend.py:310-315);
        # one traversal for both categories — decompose() is a no-op on
        # nodes whose ancestor was already detached, so list order is safe
        for tag in root.find_all():
            if tag.name in ("script", "noscript", "style") or "hidden" in tag.attrs:
                tag.decompose()
        self._fix_invalid_paragraph_structure(root)

        content = root.find("body") or root
        # one traversal collects both the <br>s to rewrite and the first
        # non-table heading (html_backend.py:325-341) — the two scans are
        # independent (headings are never <br>)
        brs: list = []
        first_heading = None
        for node in content.descendants:
            if isinstance(node, Tag):
                if node.name == "br":
                    brs.append(node)
                elif (
                    first_heading is None
                    and node.name in _HEADING_TAGS
                    and node.find_parent("table") is None
                ):
                    first_heading = node
        for br in brs:
            br.replace_with(NavString("\n"))
        self.content_layer = (
            ContentLayer.BODY if first_heading is None else ContentLayer.FURNITURE
        )
        self._walk(content, doc)
        return doc

    # ------------------------------------------------- paragraph DOM repair
    @staticmethod
    def _fix_invalid_paragraph_structure(root: Tag) -> None:
        """Browser-like rewrite of <p> with block-level content
        (html_backend.py:343-416)."""
        paragraphs = [
            p for p in root.find_all("p")
            if p.find(_PARA_BREAKERS) is not None
        ]
        for p in paragraphs:
            parent = p.parent
            if parent is None:
                continue
            new_nodes: list = []
            current_p: Optional[Tag] = None

            def start_para():
                nonlocal current_p
                if current_p is None:
                    current_p = Tag("p")
                    new_nodes.append(current_p)

            def flush_para_if_empty():
                nonlocal current_p
                if current_p is not None and not current_p.get_text(strip=True):
                    for i, n in enumerate(new_nodes):
                        if n is current_p:
                            del new_nodes[i]
                            break
                current_p = None

            for node in list(p.contents):
                if isinstance(node, NavString):
                    text = str(node)
                    node.extract()
                    if text.strip():
                        start_para()
                        current_p.append(NavString(text))
                    continue
                if isinstance(node, Tag):
                    node.extract()
                    if node.name in _PARA_BREAKERS:
                        flush_para_if_empty()
                        new_nodes.append(node)
                    else:
                        start_para()
                        current_p.append(node)
            flush_para_if_empty()

            idx = -1
            for i, sib in enumerate(parent.contents):
                if sib is p:
                    idx = i
                    break
            if idx < 0:
                continue
            p.extract()
            for n in reversed(new_nodes):
                parent.insert(idx, n)

    # ----------------------------------------------------------- tree walk
    def _walk(self, element: Tag, doc: DLDocument) -> list[str]:
        added_refs: list[str] = []
        buffer = AnnotatedTextList()

        def flush_buffer() -> None:
            if not buffer:
                return
            annotated = buffer.simplify_text_elements()
            parts = annotated.split_by_newline()
            buffer.clear()
            if not "".join(el.text for el in annotated):
                return
            for part in parts:
                with self._use_inline_group(part, doc):
                    for at in part:
                        if at.text.strip():
                            seg_clean = clean_unicode(at.text.strip())
                            if at.code:
                                item = doc.add_code(
                                    parent=self.parents[self.level],
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            else:
                                item = doc.add_text(
                                    parent=self.parents[self.level],
                                    label="text",
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            added_refs.append(item.get_ref())

        for node in element.contents:
            if isinstance(node, Tag):
                name = node.name.lower()
                if name == "img":
                    flush_buffer()
                    ref = self._emit_image(node, doc)
                    if ref:
                        added_refs.append(ref)
                elif name in _FORMAT_TAG_MAP:
                    flush_buffer()
                    with self._use_format([name]):
                        added_refs.extend(self._walk(node, doc))
                elif name == "a":
                    with self._use_hyperlink(node):
                        added_refs.extend(self._walk(node, doc))
                elif name in _BLOCK_TAGS:
                    flush_buffer()
                    added_refs.extend(self._handle_block(node, doc))
                elif node.find(_BLOCK_TAGS) is not None:
                    flush_buffer()
                    added_refs.extend(self._walk(node, doc))
                else:
                    buffer.extend(
                        self._extract_annotated(
                            node, find_parent_annotation=True, keep_newlines=True
                        )
                    )
            elif isinstance(node, NavString) and not node.preformatted:
                if str(node).strip("\n\r") == "":
                    flush_buffer()
                else:
                    buffer.extend(
                        self._extract_annotated(
                            node, find_parent_annotation=True, keep_newlines=True
                        )
                    )
        flush_buffer()
        return added_refs

    # ------------------------------------------------- inline text extract
    def _collect_parent_format_tags(self, item) -> list[str]:
        # one ancestor walk, then _FORMAT_TAG_MAP-ordered filter — same
        # output as walking once per format tag, O(depth) not O(7·depth)
        seen = set()
        this_parent = item.parent
        while this_parent is not None:
            seen.add(this_parent.name)
            this_parent = this_parent.parent
        return [t for t in _FORMAT_TAG_MAP if t in seen]

    @property
    def _formatting(self) -> Optional[Formatting]:
        kwargs: dict = {}
        for t in self.format_tags:
            kwargs.update(_FORMAT_TAG_MAP[t])
        if not kwargs:
            return None
        return Formatting(**kwargs)

    def _extract_annotated(
        self,
        item,
        ignore_list: bool = False,
        find_parent_annotation: bool = False,
        keep_newlines: bool = False,
    ) -> AnnotatedTextList:
        """Inline run extraction (html_backend.py:749-827)."""
        result = AnnotatedTextList()

        if find_parent_annotation:
            format_tags = self._collect_parent_format_tags(item)
            this_parent = item.parent
            while this_parent is not None:
                if this_parent.name == "a" and this_parent.get("href"):
                    with self._use_format(format_tags):
                        with self._use_hyperlink(this_parent):
                            return self._extract_annotated(item, ignore_list)
                this_parent = this_parent.parent

        if isinstance(item, NavString):
            if item.preformatted:
                return AnnotatedTextList()
            text = item.strip()
            code = any(t in self.format_tags for t in _CODE_TAGS)
            if text:
                return AnnotatedTextList([
                    AnnotatedText(
                        text=text,
                        hyperlink=self.hyperlink,
                        formatting=self._formatting,
                        code=code,
                    )
                ])
            if keep_newlines and item.strip("\n\r") == "":
                return AnnotatedTextList([
                    AnnotatedText(
                        text="\n",
                        hyperlink=self.hyperlink,
                        formatting=self._formatting,
                        code=code,
                    )
                ])
            return AnnotatedTextList()

        tag = item
        if not ignore_list or (tag.name not in ("ul", "ol")):
            for child in tag.contents:
                if isinstance(child, Tag) and child.name in _FORMAT_TAG_MAP:
                    with self._use_format([child.name]):
                        result.extend(
                            self._extract_annotated(
                                child, ignore_list, keep_newlines=keep_newlines
                            )
                        )
                elif isinstance(child, Tag) and child.name == "a":
                    with self._use_hyperlink(child):
                        result.extend(
                            self._extract_annotated(
                                child, ignore_list, keep_newlines=keep_newlines
                            )
                        )
                else:
                    result.extend(
                        self._extract_annotated(
                            child, ignore_list, keep_newlines=keep_newlines
                        )
                    )
        return result

    # ------------------------------------------------------ context helpers
    @contextmanager
    def _use_hyperlink(self, tag: Tag):
        old = None
        new = None
        href = tag.get("href")
        if href is None:
            yield None
        else:
            if isinstance(href, str) and href:
                old = self.hyperlink
                new = resolve_hyperlink(href, self.base_path)
                self.hyperlink = new
            try:
                yield None
            finally:
                if new:
                    self.hyperlink = old

    @contextmanager
    def _use_format(self, tags: list):
        if not tags:
            yield None
        else:
            self.format_tags.extend(tags)
            try:
                yield None
            finally:
                self.format_tags = self.format_tags[: -len(tags)]

    @contextmanager
    def _use_inline_group(self, annotated_list, doc: DLDocument):
        if len(annotated_list) > 1:
            group = doc.add_group(
                label="inline",
                parent=self.parents[self.level],
                content_layer=self.content_layer,
            )
            self.parents[self.level + 1] = group
            self.level += 1
            try:
                yield None
            finally:
                self.parents[self.level] = None
                self.level -= 1
        else:
            yield None

    @contextmanager
    def _use_section_group(self, tag: Tag, doc: DLDocument, furniture: bool):
        prev_layer = self.content_layer
        if furniture:
            self.content_layer = ContentLayer.FURNITURE
        self.parents[self.level + 1] = doc.add_group(
            name=tag.name,
            label="section",
            parent=self.parents[self.level],
            content_layer=self.content_layer,
        )
        self.level += 1
        try:
            yield None
        finally:
            self.parents[self.level + 1] = None
            self.level -= 1
            if furniture:
                self.content_layer = prev_layer

    @contextmanager
    def _use_table_cell_context(self):
        original_level = self.level
        original_parents = self.parents.copy()
        try:
            yield
        finally:
            self.level = original_level
            self.parents = original_parents

    # ----------------------------------------------------------- block tags
    def _handle_block(self, tag: Tag, doc: DLDocument) -> list[str]:
        added_refs: list[str] = []
        name = tag.name.lower()

        if name == "figure":
            img = tag.find("img")
            if img is not None:
                ref = self._emit_image(img, doc)
                if ref is not None:
                    added_refs.append(ref)

        elif name in _HEADING_TAGS:
            added_refs.extend(self._handle_heading(tag, doc))

        elif name in ("ul", "ol"):
            added_refs.append(self._handle_list(tag, doc))

        elif name in ("p", "address", "summary"):
            text_list = self._extract_annotated(tag, find_parent_annotation=True)
            annotated = text_list.simplify_text_elements()
            for part in annotated.split_by_newline():
                with self._use_inline_group(part, doc):
                    for at in part:
                        seg = at.text.strip()
                        if seg:
                            seg_clean = clean_unicode(seg)
                            if at.code:
                                item = doc.add_code(
                                    parent=self.parents[self.level],
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            else:
                                item = doc.add_text(
                                    parent=self.parents[self.level],
                                    label="text",
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            added_refs.append(item.get_ref())
            for img in tag.find_all("img"):
                self._emit_image(img, doc)

        elif name == "table":
            num_rows, num_cols = self.get_html_table_row_col(tag)
            docling_table = doc.add_table(
                data=TableData(num_rows=num_rows, num_cols=num_cols),
                parent=self.parents[self.level],
                content_layer=self.content_layer,
            )
            added_refs.append(docling_table.get_ref())
            self._parse_table_data(tag, doc, docling_table, num_rows, num_cols)
            # reference quirk (html_backend.py:1244-1248): for every <img>
            # inside a table it emits a placeholder from the *table* tag
            for _img in tag.find_all("img"):
                ref2 = self._emit_image(tag, doc)
                if ref2 is not None:
                    added_refs.append(ref2)

        elif name == "pre":
            text_list = self._extract_annotated(
                tag, find_parent_annotation=True, keep_newlines=True
            )
            annotated = text_list.simplify_text_elements()
            with self._use_inline_group(annotated, doc):
                for at in annotated:
                    item = doc.add_code(
                        parent=self.parents[self.level],
                        text=clean_unicode(at.text.strip()),
                        content_layer=self.content_layer,
                        formatting=at.formatting,
                        hyperlink=at.hyperlink,
                    )
                    added_refs.append(item.get_ref())

        elif name == "footer":
            with self._use_section_group(tag, doc, furniture=True):
                self._walk(tag, doc)

        elif name == "details":
            with self._use_section_group(tag, doc, furniture=False):
                self._walk(tag, doc)

        return added_refs

    # -------------------------------------------------------------- heading
    def _handle_heading(self, tag: Tag, doc: DLDocument) -> list[str]:
        added_ref: list[str] = []
        self.content_layer = ContentLayer.BODY
        level = int(tag.name[1])
        annotated = self._extract_annotated(
            tag, find_parent_annotation=True
        ).to_single_text_element()
        text_clean = clean_unicode(annotated.text)
        if level == 1:
            for key in self.parents:
                self.parents[key] = None
            self.level = 0
            item = doc.add_title(
                text_clean,
                content_layer=self.content_layer,
                formatting=annotated.formatting,
                hyperlink=annotated.hyperlink,
            )
            self.parents[self.level + 1] = item
            added_ref = [item.get_ref()]
        else:
            level -= 1
            if level > self.level:
                for i in range(self.level, level):
                    self.parents[i + 1] = doc.add_group(
                        name=f"header-{i + 1}",
                        label="section",
                        parent=self.parents[i],
                        content_layer=self.content_layer,
                    )
                self.level = level
            elif level < self.level:
                for key in self.parents:
                    if key > level + 1:
                        self.parents[key] = None
                self.level = level
            item = doc.add_heading(
                parent=self.parents[self.level],
                text=text_clean,
                orig=annotated.text,
                level=self.level,
                content_layer=self.content_layer,
                formatting=annotated.formatting,
                hyperlink=annotated.hyperlink,
            )
            self.parents[self.level + 1] = item
            added_ref = [item.get_ref()]
        self.level += 1
        for img in tag.find_all("img"):
            ref = self._emit_image(img, doc)
            if ref:
                added_ref.append(ref)
        return added_ref

    # ---------------------------------------------------------------- lists
    def _handle_list(self, tag: Tag, doc: DLDocument) -> str:
        is_ordered = tag.name.lower() == "ol"
        start: Optional[int] = None
        if is_ordered:
            start_attr = tag.get("start")
            if isinstance(start_attr, str) and start_attr.isnumeric():
                start = int(start_attr)
            group_name = "ordered list" + (
                f" start {start}" if start is not None else ""
            )
        else:
            group_name = "list"
        list_group = doc.add_list_group(
            name=group_name,
            parent=self.parents[self.level],
            content_layer=self.content_layer,
        )
        self.parents[self.level + 1] = list_group
        self.list_ordered_by_ref[list_group.self_ref] = is_ordered
        if is_ordered and start is not None:
            self.list_start_by_ref[list_group.self_ref] = start
        self.level += 1

        for li in tag.find_all({"li", "ul", "ol"}, recursive=False):
            if li.name in ("ul", "ol"):
                # invalid-HTML nested list directly under a list
                self._handle_block(li, doc)
                continue

            if is_ordered and start is not None:
                marker = f"{start + len(list_group.children)}."
            else:
                marker = ""

            parts = self._extract_annotated(
                li, ignore_list=True, find_parent_annotation=True
            )
            min_parts = parts.simplify_text_elements()
            li_text = _WS_RE.sub(" ", "".join(el.text for el in min_parts)).strip()

            if li_text:
                if len(min_parts) > 1:
                    self.parents[self.level + 1] = doc.add_list_item(
                        text="",
                        enumerated=is_ordered,
                        marker=marker,
                        parent=list_group,
                        content_layer=self.content_layer,
                    )
                    self.level += 1
                    with self._use_inline_group(min_parts, doc):
                        for at in min_parts:
                            seg = _WS_RE.sub(" ", at.text).strip()
                            seg_clean = clean_unicode(seg)
                            if at.code:
                                doc.add_code(
                                    parent=self.parents[self.level],
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                            else:
                                doc.add_text(
                                    parent=self.parents[self.level],
                                    label="text",
                                    text=seg_clean,
                                    content_layer=self.content_layer,
                                    formatting=at.formatting,
                                    hyperlink=at.hyperlink,
                                )
                    for sublist in li.find_all({"ul", "ol"}, recursive=False):
                        self._handle_block(sublist, doc)
                    self.parents[self.level] = None
                    self.level -= 1
                else:
                    at = min_parts[0]
                    li_text = _WS_RE.sub(" ", at.text).strip()
                    li_clean = clean_unicode(li_text)
                    self.parents[self.level + 1] = doc.add_list_item(
                        text=li_clean,
                        enumerated=is_ordered,
                        marker=marker,
                        orig=li_text,
                        parent=list_group,
                        content_layer=self.content_layer,
                        formatting=at.formatting,
                        hyperlink=at.hyperlink,
                    )
                    for sublist in li.find_all({"ul", "ol"}, recursive=False):
                        self.level += 1
                        self._handle_block(sublist, doc)
                        self.parents[self.level + 1] = None
                        self.level -= 1
            else:
                for sublist in li.find_all({"ul", "ol"}, recursive=False):
                    self._handle_block(sublist, doc)

            for img in li.find_all("img"):
                self._emit_image(img, doc)

        self.parents[self.level + 1] = None
        self.level -= 1
        return list_group.get_ref()

    # --------------------------------------------------------------- tables
    @staticmethod
    def _get_cell_spans(cell: Tag) -> tuple:
        """colspan/rowspan with defaults (html_backend.py:1465-1490)."""

        def extract_num(s: str) -> int:
            if s and s[0].isnumeric():
                match = re.search(r"\d+", s)
                if match:
                    return int(match.group())
            return 1

        return (
            extract_num(str(cell.get("colspan", "1"))),
            extract_num(str(cell.get("rowspan", "1"))),
        )

    @staticmethod
    def get_html_table_row_col(tag: Tag) -> tuple:
        """Row/col counting with span + header-row rules
        (html_backend.py:1155-1178)."""
        for t in tag.find_all({"thead", "tbody"}, recursive=False):
            t.unwrap()
        num_rows = 0
        num_cols = 0
        for row in tag.find_all("tr", recursive=False):
            col_count = 0
            is_row_header = True
            for cell in row.find_all({"td", "th"}, recursive=False):
                col_span, row_span = HtmlConverter._get_cell_spans(cell)
                col_count += col_span
                if cell.name == "td" or row_span == 1:
                    is_row_header = False
            num_cols = max(num_cols, col_count)
            if not is_row_header:
                num_rows += 1
        return num_rows, num_cols

    @staticmethod
    def get_text(item) -> str:
        """Text concat with trailing space after <p>/<li>
        (html_backend.py:1395-1423)."""

        def rec(node) -> list:
            if isinstance(node, NavString):
                if node.preformatted:
                    return []
                return [str(node)]
            parts: list = []
            for child in node.contents:
                parts.extend(rec(child))
            joined = "".join(parts)
            return [joined + " " if node.name in ("p", "li") else joined]

        return "".join(rec(item))

    def _is_rich_table_cell(self, cell: Tag) -> bool:
        """RichTableCell detection incl. the reference's always-truthy
        generator quirk (html_backend.py:480-514)."""
        children = cell.find_all()
        if not children:
            content = [c for c in cell.contents if isinstance(c, NavString)]
            return len(content) > 1
        annotations = self._extract_annotated(cell, find_parent_annotation=True)
        if not annotations:
            return True  # reference: bool(generator) is always True
        if len(annotations) == 1:
            anno = annotations[0]
            return bool(anno.formatting) or bool(anno.hyperlink) or anno.code
        return True

    def _parse_table_data(
        self,
        element: Tag,
        doc: DLDocument,
        docling_table: TableItem,
        num_rows: int,
        num_cols: int,
    ) -> None:
        """Span-grid table parsing (html_backend.py:516-630)."""
        for t in element.find_all({"thead", "tbody"}, recursive=False):
            t.unwrap()
        grid = [[None for _ in range(num_cols)] for _ in range(num_rows)]
        start_row_span = 0
        row_idx = -1

        for row in element.find_all("tr", recursive=False):
            cells = row.find_all({"td", "th"}, recursive=False)
            col_header = True
            row_header = True
            for html_cell in cells:
                _, row_span = self._get_cell_spans(html_cell)
                if html_cell.name == "td":
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
            for html_cell in cells:
                for formula in html_cell.find_all("inline-formula"):
                    math_parts = formula.get_text().split("$$")
                    if len(math_parts) == 3:
                        formula.replace_with(NavString(f"$${math_parts[1]}$$"))

                provs_in_cell: list[str] = []
                rich = self._is_rich_table_cell(html_cell)
                ref_for_rich_cell = None
                if rich:
                    with self._use_table_cell_context():
                        provs_in_cell = self._walk(html_cell, doc)
                    if len(provs_in_cell) >= 1:
                        group_name = (
                            f"rich_cell_group_{len(doc.tables)}_{col_idx}_"
                            f"{start_row_span + row_idx}"
                        )
                        group = doc.add_group(
                            label="unspecified",
                            name=group_name,
                            parent=docling_table,
                        )
                        for prov in provs_in_cell:
                            group.children.append(prov)
                            pr_item = doc.resolve(prov)
                            old_parent = doc.resolve(pr_item.parent_ref)
                            if prov in old_parent.children:
                                old_parent.children.remove(prov)
                            pr_item.parent_ref = group.get_ref()
                        ref_for_rich_cell = group.get_ref()
                    else:
                        rich = False

                text = clean_unicode(self.get_text(html_cell).strip())
                col_span, row_span = self._get_cell_spans(html_cell)
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

                cell_model = TableCellModel(
                    text=text,
                    row_span=row_span,
                    col_span=col_span,
                    start_row_offset_idx=start_row_span + row_idx,
                    end_row_offset_idx=start_row_span + row_idx + row_span,
                    start_col_offset_idx=col_idx,
                    end_col_offset_idx=col_idx + col_span,
                    column_header=col_header,
                    row_header=((not col_header) and html_cell.name == "th"),
                    ref=ref_for_rich_cell if rich else None,
                )
                doc.add_table_cell(docling_table, cell_model)

    # --------------------------------------------------------------- images
    def _emit_image(self, img_tag: Tag, doc: DLDocument) -> Optional[str]:
        """Picture placeholder + caption wiring (html_backend.py:1279-1342);
        image bytes are never fetched in the table pipeline."""
        figure = img_tag.find_parent("figure")
        caption = AnnotatedTextList()
        parent = self.parents[self.level]

        img_hyperlink = None
        this_parent = img_tag.parent
        while this_parent is not None:
            if this_parent.name == "a" and this_parent.get("href"):
                img_hyperlink = this_parent.get("href")
                break
            this_parent = this_parent.parent

        if img_hyperlink:
            img_text = img_tag.get("alt") or ""
            caption.append(
                AnnotatedText(
                    text=img_text, hyperlink=normalize_hyperlink(img_hyperlink)
                )
            )

        if figure is not None:
            caption_tag = figure.find("figcaption", recursive=False)
            if caption_tag is not None:
                caption = self._extract_annotated(
                    caption_tag, find_parent_annotation=True
                )
        if not caption and img_tag.get("alt"):
            caption = AnnotatedTextList([AnnotatedText(text=img_tag.get("alt"))])

        cap = caption.to_single_text_element()
        caption_item = None
        if cap.text:
            caption_item = doc.add_text(
                label="caption",
                text=clean_unicode(cap.text.strip()),
                orig=cap.text,
                content_layer=self.content_layer,
                formatting=cap.formatting,
                hyperlink=cap.hyperlink,
            )
        placeholder = doc.add_picture(
            caption=caption_item,
            parent=parent,
            content_layer=self.content_layer,
        )
        return placeholder.get_ref()


def convert_html(
    data: bytes, name: str = "file", filename: str = "file",
    base_path: Optional[str] = None,
) -> DLDocument:
    """Convenience: one-shot HTML conversion."""
    return HtmlConverter(base_path=base_path).convert(
        data, name=name, filename=filename
    )
