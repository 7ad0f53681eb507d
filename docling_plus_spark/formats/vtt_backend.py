"""WebVTT → DLDocument (SURVEY §2.1 S9, vtt).

Behavior-parity reimplementation of the reference WebVTTDocumentBackend
(docling/docling/backend/webvtt_backend.py:436-572, cue grammar
:27-434): WEBVTT signature check, NOTE/STYLE/REGION block removal, cue
blocks split on blank lines, an optional identifier line, strict
timestamp validation, and a cue-payload span tree over the
``<i>/<b>/<u>/<c>/<v>`` tags.  Each cue becomes a SECTION group holding
the timing line and its spans; voice spans become INLINE groups prefixed
with ``"<speaker> (classes): "``.  Malformed cues are dropped (the
reference skips them with a warning); malformed *files* raise, which the
extraction stage converts to a failure-status row.

Verified byte-identical against the reference's 3 WebVTT golden fixtures
(md + itxt) and tree-identical JSON (tests/test_formats.py).
"""

from __future__ import annotations

import re

from docling_plus_spark.doc.document import DLDocument, Formatting
from docling_plus_spark.html.backend import binary_hash_of

_TS_RE = re.compile(r"^(?:(\d{2,}):)?([0-5]\d):([0-5]\d)\.(\d{3})$")
_TAG_RE = re.compile(r"<(/?)(i|b|c|u|v(?:\.[^\t\n\r &<>.]+)*)(?:\s+([^>]*))?>")
_VOICE_OPEN_RE = re.compile(
    r"^<v(?P<cls>\.[^\t\n\r &<>]+)?[ \t]+(?P<ann>[^\n\r&>]+)>"
)
_NOTE_RE = re.compile(r"^(NOTE[^\n]*\n(?:.+\n)*?)\n", re.MULTILINE)
_STYLE_REGION_RE = re.compile(r"^(STYLE|REGION)(?:.+\n)*?\n", re.MULTILINE)


def verify_signature(content: str) -> bool:
    """W3C file signature: 'WEBVTT' alone or followed by space/tab/LF."""
    if content == "WEBVTT":
        return True
    return (
        len(content) > 6
        and content.startswith("WEBVTT")
        and content[6] in (" ", "\t", "\n")
    )


def _ts_seconds(raw: str) -> float:
    m = _TS_RE.match(raw)
    if not m:
        raise ValueError(f"invalid WebVTT timestamp: {raw!r}")
    hours = int(m.group(1)) if m.group(1) else 0
    return hours * 3600 + int(m.group(2)) * 60 + int(m.group(3)) + int(m.group(4)) / 1000.0


# Cue-payload spans are tuples:
#   ("text", s) | ("i"|"b"|"u"|"c", children) | ("v", annotation, classes, children)

def _text_span(s: str):
    if not s or any(ch in s for ch in "\n\r&<"):
        raise ValueError("invalid cue text span")
    return ("text", s)


def _span_str(span) -> str:
    kind = span[0]
    if kind == "text":
        return span[1]
    inner = "".join(_span_str(c) for c in span[-1])
    if kind == "v":
        tag = "v." + ".".join(span[2]) if span[2] else "v"
        return f"<{tag} {span[1]}>{inner}</v>"
    return f"<{kind}>{inner}</{kind}>"


def _parse_cue(block: str):
    """One cue block → (identifier, timings_line, payload spans).

    Raises ValueError on anything malformed; the caller drops the cue.
    """
    lines = block.strip().splitlines()
    if not lines:
        raise ValueError("empty cue block")
    identifier = None
    timing_line, rest = lines[0], lines[1:]
    if "-->" not in timing_line and len(lines) > 1:
        identifier, timing_line, rest = lines[0], lines[1], lines[2:]
    if "-->" not in timing_line:
        raise ValueError("cue block without timings")
    start, end = (t.strip() for t in timing_line.split("-->"))
    end = re.split(" |\t", end)[0]  # drop the cue-settings list
    if _ts_seconds(end) <= _ts_seconds(start):
        raise ValueError("cue end must be after start")

    cue_text = " ".join(rest).strip()
    if cue_text.startswith("<v") and "</v>" not in cue_text:
        cue_text += "</v>"  # end tag may be omitted for brevity

    stack: list[list] = [[]]
    open_tags: list = []  # "i"/"b"/"u"/"c" or ("v", raw_open_tag)
    pos = 0
    for m in _TAG_RE.finditer(cue_text):
        if m.start() > pos:
            stack[-1].append(_text_span(cue_text[pos : m.start()]))
        tag = m.group(0)
        if tag in ("<i>", "<b>", "<u>", "<c>"):
            open_tags.append(tag[1])
            stack.append([])
        elif tag in ("</i>", "</b>", "</u>", "</c>"):
            children = stack.pop()
            stack[-1].append((tag[2], children))
            open_tags.pop()
        elif tag.startswith("<v"):
            open_tags.append(("v", tag))
            stack.append([])
        elif tag.startswith("</v"):
            children = stack.pop() if stack else []
            if open_tags and isinstance(open_tags[-1], tuple):
                _, raw_open = open_tags.pop()
                vm = _VOICE_OPEN_RE.match(raw_open)
                if vm:
                    annotation = vm.group("ann").strip()
                    if not annotation:
                        raise ValueError("empty voice annotation")
                    classes = [
                        c for c in (vm.group("cls") or "").split(".") if c
                    ]
                    stack[-1].append(("v", annotation, classes, children))
        # any other tag form (e.g. '<b attr>') is dropped, text kept
        pos = m.end()
    if pos < len(cue_text):
        stack[-1].append(_text_span(cue_text[pos:]))

    payload = stack[0]
    for span in payload:
        if "-->" in _span_str(span):
            raise ValueError("'-->' in cue payload")
    return identifier, f"{start} --> {end}", payload


def parse_vtt(content: str):
    """Normalized file text → list of parsed cues (malformed ones dropped)."""
    body = content.split("\n", 1)[1] if "\n" in content else ""
    body = _NOTE_RE.sub("", body)
    body = _STYLE_REGION_RE.sub("", body)
    cues = []
    for block in re.split(r"\n\s*\n", body.strip()):
        try:
            cues.append(_parse_cue(block))
        except ValueError:
            continue  # reference logs + skips (webvtt_backend.py:416-419)
    return cues


def _add_component(doc: DLDocument, span, parent) -> None:
    kind = span[0]
    fmt = Formatting(bold=kind == "b", italic=kind == "i", underline=kind == "u")
    if kind == "text":
        text = span[1]
    else:
        # nesting beyond one level is flattened to direct text children,
        # matching the reference's TODO behavior (webvtt_backend.py:478-500)
        text = "".join(c[1] for c in span[-1] if c[0] == "text")
    text = text.strip()
    if text:
        doc.add_text(label="text", text=text, parent=parent, formatting=fmt)


def convert_vtt(data: bytes, name: str = "file", filename: str = "file.vtt") -> DLDocument:
    content = data.decode("utf-8")
    if not verify_signature(content):
        raise ValueError("invalid WebVTT file signature")
    content = content.replace("\r\n", "\n").replace("\r", "\n")

    doc = DLDocument(
        name=name, filename=filename, binary_hash=binary_hash_of(data),
        mimetype="text/vtt",
    )
    for identifier, timings, payload in parse_vtt(content):
        block = doc.add_group(label="section", name="WebVTT cue block")
        if identifier:
            doc.add_text(label="text", text=identifier, parent=block)
        doc.add_text(label="text", text=timings, parent=block)
        for span in payload:
            if span[0] == "v":
                _, annotation, classes, children = span
                voice_group = doc.add_group(
                    label="inline", name="WebVTT cue voice span", parent=block
                )
                voice = annotation
                if classes:
                    voice += f" ({', '.join(classes)})"
                doc.add_text(label="text", text=voice + ": ", parent=voice_group)
                for child in children:
                    _add_component(doc, child, voice_group)
            else:
                _add_component(doc, span, block)
    return doc
