"""Markdown → DLDocument (SURVEY §2.1 S9, md-subset).

The reference parses Markdown with the marko CommonMark parser
(docling/docling/backend/md_backend.py:73, 614 LoC) — not available
here. This is a line-based subset covering the structures the extraction
pipeline needs from web-scale markdown: ATX headings, paragraphs,
bullet/ordered lists, fenced code blocks, and pipe tables. Inline
emphasis is carried through as plain text. Byte-identical vs the
reference's plain-markdown goldens (duck/wiki/ending_with_table, modulo
their trailing newline); marko-specific inline features remain a
documented subset.

Documents containing raw HTML blocks follow the reference's fallback
(md_backend.py:568-609): the markdown is rendered to HTML with the raw
blocks inlined verbatim and converted by the byte-parity HTML backend —
that is how the reference produces the ``mixed*`` goldens (their origin
mimetype is text/html).
"""

from __future__ import annotations

import html as _html
import re

from docling_plus_spark.doc.document import DLDocument, TableCellModel, TableData
from docling_plus_spark.html.backend import binary_hash_of

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BULLET_RE = re.compile(r"^(\s*)[-*+]\s+(.*)$")
_ORDERED_RE = re.compile(r"^(\s*)(\d+)[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^```(\w*)\s*$")
_TABLE_ROW_RE = re.compile(r"^\s*\|(.+)\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?\s*:?-+:?\s*(\|\s*:?-+:?\s*)+\|?\s*$")
_HTML_BLOCK_RE = re.compile(r"^<(?:[a-zA-Z!/]|\?)")
_BULLET_CHAR_RE = re.compile(r"^(\s*)([-*+])\s+(.*)$")
_MD_ESCAPE_RE = re.compile(r"\\([\\`*_{}\[\]()#+\-.!<>])")


def _flush_para(doc: DLDocument, buf: list) -> None:
    """Paragraph → one item, or an inline group when it holds several
    inline elements (reference md_backend.py:483-487)."""
    if not buf:
        return
    tokens = _parse_inline(" ".join(buf))
    buf.clear()
    if not tokens:
        return
    if len(tokens) == 1:
        _add_inline_member(doc, tokens[0], None)
    else:
        group = doc.add_group(label="inline", name="group")
        for tok in tokens:
            _add_inline_member(doc, tok, group)


# -- raw-HTML fallback (reference md_backend.py:568-609) ---------------------

def _has_html_block(lines: list) -> bool:
    in_code = False
    for line in lines:
        if _FENCE_RE.match(line):
            in_code = not in_code
            continue
        if not in_code and _HTML_BLOCK_RE.match(line):
            return True
    return False


def _inline_html(text: str) -> str:
    """Markdown inline text → HTML text: links become <a>, codespans
    become <code>, backslash escapes and entity references resolve
    (marko semantics), the rest is markup-escaped."""
    link_parts = re.split(r"\[([^\]]*)\]\(([^)\s]+)\)", text)
    out = []
    for j in range(0, len(link_parts), 3):
        chunk = link_parts[j]
        parts = re.split(r"`([^`]*)`", chunk)
        for i, part in enumerate(parts):
            if i % 2:
                # codespan content raw — the reference's export_to_html
                # leaves code text unescaped, so entities decode once more
                # in the html backend pass (escaped_characters golden)
                out.append(f"<code>{part.strip()}</code>")
            else:
                # a backslash-escaped char becomes its own inline token in
                # marko, and tokens join with spaces ("2\\. strange" →
                # "2 . strange" in the mixed_without_h1 golden)
                part = _MD_ESCAPE_RE.sub(r" \1 ", part)
                part = re.sub(r"\s+", " ", part)
                part = _html.unescape(part)
                out.append(_html.escape(part, quote=False))
        if j + 2 < len(link_parts):
            label, url = link_parts[j + 1], link_parts[j + 2]
            label_html = _html.escape(
                _html.unescape(_MD_ESCAPE_RE.sub(r"\1", label)), quote=False
            )
            out.append(f'<a href="{_html.escape(url)}">{label_html}</a>')
    return "".join(out)


def _markdown_to_html(lines: list, name: str) -> str:
    out = [f"<html><head><title>{_html.escape(name)}</title></head><body>"]
    list_stack: list = []  # (indent, tag)
    para: list = []
    code: list = []
    in_code = False
    in_html = False
    table_buf: list = []

    def close_lists(upto_indent: int = -1) -> None:
        while list_stack and list_stack[-1][0] > upto_indent:
            _, tag, _ = list_stack.pop()
            out.append(f"</li></{tag}>")

    def flush_para() -> None:
        if para:
            out.append(f"<p>{_inline_html(' '.join(para))}</p>")
            para.clear()

    def flush_table() -> None:
        nonlocal table_buf
        rows = [
            [c.strip() for c in m.group(1).split("|")]
            for m in (_TABLE_ROW_RE.match(ln) for ln in table_buf)
            if m
        ]
        seps = [i for i, ln in enumerate(table_buf) if _TABLE_SEP_RE.match(ln)]
        header = bool(seps)
        rows = [r for i, r in enumerate(rows) if i not in seps]
        if rows:
            out.append("<table>")
            for ri, row in enumerate(rows):
                tag = "th" if header and ri == 0 else "td"
                cells = "".join(f"<{tag}>{_inline_html(c)}</{tag}>" for c in row)
                out.append(f"<tr>{cells}</tr>")
            out.append("</table>")
        table_buf = []

    prev_blank = True
    for line in lines:
        if in_html:
            if not line.strip():
                in_html = False
                prev_blank = True
            else:
                out.append(line)
            continue
        if in_code:
            if _FENCE_RE.match(line):
                # raw, same export_to_html non-escaping as codespans
                out.append("<pre><code>" + "\n".join(code) + "</code></pre>")
                code.clear()
                in_code = False
            else:
                code.append(line)
            continue
        if _HTML_BLOCK_RE.match(line):
            flush_para()
            flush_table()
            close_lists()
            out.append(line)
            in_html = True
            prev_blank = False
            continue
        if _FENCE_RE.match(line):
            flush_para()
            flush_table()
            close_lists()
            in_code = True
            prev_blank = False
            continue
        if _TABLE_ROW_RE.match(line) or (_TABLE_SEP_RE.match(line) and table_buf):
            flush_para()
            close_lists()
            table_buf.append(line)
            prev_blank = False
            continue
        flush_table()
        h = _HEADING_RE.match(line)
        b = _BULLET_CHAR_RE.match(line)
        o = _ORDERED_RE.match(line)
        if h:
            flush_para()
            close_lists()
            if h.group(2).strip():  # empty headings dropped (marko)
                out.append(
                    f"<h{len(h.group(1))}>{_inline_html(h.group(2))}</h{len(h.group(1))}>"
                )
        elif (b or o) and not (b or o).group(3).strip():
            pass  # empty list items dropped (marko)
        elif b or o:
            flush_para()
            indent = len((b or o).group(1))
            tag = "ul" if b else "ol"
            char = b.group(2) if b else "1"
            text = _inline_html(b.group(3) if b else o.group(3))
            if not list_stack or indent > list_stack[-1][0]:
                out.append(f"<{tag}><li>{text}")
                list_stack.append((indent, tag, char))
            else:
                close_lists(indent)
                if list_stack and (
                    list_stack[-1][1] != tag or list_stack[-1][2] != char
                ):
                    # list type or bullet symbol changed: a new list starts
                    # (CommonMark; 'changing symbol' case in nested.md)
                    _, old_tag, _ = list_stack.pop()
                    out.append(f"</li></{old_tag}>")
                if list_stack:
                    out.append(f"</li><li>{text}")
                else:
                    out.append(f"<{tag}><li>{text}")
                    list_stack.append((indent, tag, char))
        elif re.match(r"^\s*(?:[-*+]|\d+[.)]|#{1,6})\s*$", line):
            pass  # bare markers / empty headings dropped (marko)
        elif not line.strip():
            # lists stay open across blank lines (loose lists) — they
            # close when a non-list block starts
            flush_para()
        else:
            if not para and list_stack:
                close_lists()
            para.append(line.strip())
        prev_blank = not line.strip()
    flush_para()
    flush_table()
    close_lists()
    if in_code and code:
        out.append("<pre><code>" + "\n".join(code) + "</code></pre>")
    out.append("</body></html>")
    return "\n".join(out)


# -- inline model (marko semantics; reference md_backend.py:346-438) ---------
# tokens: dict(kind='text'|'code', text, bold, italic, hyperlink)

_INLINE_SPLIT_RE = re.compile(
    r"(\[[^\]]*\]\([^)\s]+\)"      # link
    r"|`[^`]+`"                    # codespan
    r"|\*\*\*[^*]+\*\*\*"          # strong+em
    r"|\*\*[^*]+\*\*"              # strong
    r"|\*[^*]+\*)"                 # em
)
_LINK_RE = re.compile(r"^\[([^\]]*)\]\(([^)\s]+)\)$")


def _parse_inline(text: str, hyperlink=None) -> list:
    tokens: list = []
    for chunk in _INLINE_SPLIT_RE.split(text):
        if not chunk or not chunk.strip():
            continue
        link = _LINK_RE.match(chunk)
        if link:
            tokens.extend(_parse_inline(link.group(1), hyperlink=link.group(2)))
            continue
        bold = italic = False
        inner = chunk
        if chunk.startswith("***") and chunk.endswith("***"):
            bold = italic = True
            inner = chunk[3:-3]
        elif chunk.startswith("**") and chunk.endswith("**"):
            bold = True
            inner = chunk[2:-2]
        elif chunk.startswith("*") and chunk.endswith("*") and len(chunk) > 1:
            italic = True
            inner = chunk[1:-1]
        if inner.startswith("`") and inner.endswith("`"):
            tokens.append(
                {"kind": "code", "text": inner[1:-1].strip(), "bold": bold,
                 "italic": italic, "hyperlink": hyperlink}
            )
            continue
        inner = inner.strip()
        if inner:
            tokens.append(
                {"kind": "text", "text": inner, "bold": bold, "italic": italic,
                 "hyperlink": hyperlink}
            )
    return tokens


def _token_formatting(tok):
    from docling_plus_spark.doc.document import Formatting

    if tok["bold"] or tok["italic"]:
        return Formatting(bold=tok["bold"], italic=tok["italic"])
    return None


def _add_inline_member(doc: DLDocument, tok, parent) -> None:
    if tok["kind"] == "code":
        doc.add_code(
            text=tok["text"], parent=parent, formatting=_token_formatting(tok),
            hyperlink=tok["hyperlink"],
        )
    else:
        doc.add_text(
            label="text", text=tok["text"], parent=parent,
            formatting=_token_formatting(tok), hyperlink=tok["hyperlink"],
        )


def convert_markdown(
    data: bytes, name: str = "file", filename: str = "file.md"
) -> DLDocument:
    lines_all = data.decode("utf-8", "replace").split("\n")
    if _has_html_block(lines_all):
        # reference fallback: render markdown to HTML with raw blocks
        # inlined and convert via the (byte-parity) HTML backend
        from docling_plus_spark.html import convert_html

        html_str = _markdown_to_html(lines_all, name)
        doc = convert_html(
            html_str.encode("utf-8"), name=name, filename=filename
        )
        doc.binary_hash = binary_hash_of(data)
        doc.mimetype = "text/html"  # origin mimetype per the reference path
        return doc

    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="text/markdown",
    )
    lines = lines_all
    para: list = []
    open_list = None
    code_buf: list = []
    in_code = False
    table_buf: list = []

    def flush_table() -> None:
        nonlocal table_buf
        if not table_buf:
            return
        def _cell(c: str) -> str:
            # emphasis markers are consumed during inline parsing, so md
            # table cells lose them (inline_and_formatting golden)
            return re.sub(
                r"\*\*\*([^*]+)\*\*\*|\*\*([^*]+)\*\*|\*([^*]+)\*",
                lambda m: m.group(1) or m.group(2) or m.group(3),
                c.strip(),
            )

        rows = [
            [_cell(c) for c in m.group(1).split("|")]
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

    indented_code: list = []

    def flush_indented() -> None:
        # 4-space indented code block (CommonMark; blocks.md golden) —
        # blank-only blocks are dropped like marko does
        if indented_code:
            text = "\n".join(indented_code)
            if text.strip():
                doc.add_code(text=text)
            indented_code.clear()

    for line in lines:
        if in_code:
            if _FENCE_RE.match(line):
                if "\n".join(code_buf).strip():  # empty fences dropped
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
        # setext headings: a paragraph followed by ===== (title) or -----
        # (level-1 heading) — CommonMark, blocks.md golden
        if para and re.match(r"^=+\s*$", line):
            doc.add_title(text=" ".join(para))
            para.clear()
            continue
        if para and re.match(r"^-+\s*$", line) and not _BULLET_RE.match(line):
            doc.add_heading(text=" ".join(para), level=1)
            para.clear()
            continue
        if re.match(r"^\s*(?:[-*+]|\d+[.)]|#{1,6})\s*$", line):
            continue  # bare list markers / empty headings dropped (marko)
        if line.startswith("    ") and not para and open_list is None and not table_buf:
            indented_code.append(line[4:])
            continue
        flush_indented()
        flush_table()
        h = _HEADING_RE.match(line)
        if h:
            _flush_para(doc, para)
            open_list = None
            level = len(h.group(1))
            tokens = _parse_inline(h.group(2))

            def _mk_heading(tok, parent=None):
                kw = dict(
                    text=tok["text"], parent=parent,
                    formatting=_token_formatting(tok),
                    hyperlink=tok["hyperlink"],
                )
                if level == 1:
                    doc.add_title(**kw)
                else:
                    doc.add_heading(level=level - 1, **kw)

            if len(tokens) == 1:
                _mk_heading(tokens[0])
            elif tokens:
                # heading with mixed inline content: the first element
                # becomes the heading item inside an inline group
                # (reference creation-stack behavior, md_backend.py:487)
                group = doc.add_group(label="inline", name="group")
                _mk_heading(tokens[0], parent=group)
                for tok in tokens[1:]:
                    _add_inline_member(doc, tok, group)
            continue
        b = _BULLET_RE.match(line)
        o = _ORDERED_RE.match(line)
        if b or o:
            _flush_para(doc, para)
            if open_list is None:
                open_list = doc.add_list_group()
            enumerated = bool(o)
            marker = f"{o.group(2)}." if o else "-"
            tokens = _parse_inline(o.group(3) if o else b.group(2))
            if len(tokens) == 1:
                tok = tokens[0]
                doc.add_list_item(
                    text=tok["text"], enumerated=enumerated, marker=marker,
                    parent=open_list, formatting=_token_formatting(tok),
                    hyperlink=tok["hyperlink"],
                )
            elif tokens:
                # mixed inline content: list item leads an inline group
                # under the list (reference creation-stack behavior)
                group = doc.add_group(
                    label="inline", name="group", parent=open_list
                )
                tok = tokens[0]
                doc.add_list_item(
                    text=tok["text"], enumerated=enumerated, marker=marker,
                    parent=group, formatting=_token_formatting(tok),
                    hyperlink=tok["hyperlink"],
                )
                for tok in tokens[1:]:
                    _add_inline_member(doc, tok, group)
            continue
        if not line.strip():
            flush_indented()
            _flush_para(doc, para)
            open_list = None
            continue
        open_list = None
        para.append(line.strip())
    flush_indented()
    _flush_para(doc, para)
    flush_table()
    if in_code and code_buf and "\n".join(code_buf).strip():
        doc.add_code(text="\n".join(code_buf))
    return doc
