"""Per-item character spans over the exported text surface.

The north-star contract is "extracted text AND span offsets": every
content block the text serializer emits must be addressable as a
``[char_start, char_end)`` slice of the document's ``text`` column, so
downstream consumers (dedup on spans, annotation joins, token
alignment) can reference content without re-parsing HTML.

:func:`text_spans` mirrors :func:`docling_plus_spark.doc.serializers.
export_to_text` block-for-block (same iteration, same block emission,
same ``"\\n"`` joiner — reference serialization seam:
docling/docling_core-style ``export_to_text`` via markdown stripping;
our restatement at doc/serializers.py:415-425). The invariant — locked
by tests/test_spans.py — is::

    text = export_to_text(doc)
    for idx, label, start, end in text_spans(doc):
        text[start:end] == <block idx's text>

Table items emit one span per grid row (matching the serializer's
one-line-per-row emission), labeled ``table_row``.
"""

from __future__ import annotations

from typing import List, Tuple

from docling_plus_spark.doc.document import DLDocument, TableItem, TextItem


def text_spans(doc: DLDocument) -> List[Tuple[int, str, int, int]]:
    """``(item_idx, label, char_start, char_end)`` per emitted block.

    ``item_idx`` numbers emitted blocks (the serializer's emission
    order), not tree nodes — items the serializer skips (empty text,
    pictures) consume no index, so spans are dense and gap-free except
    for the 1-char ``"\\n"`` joiners.
    """
    spans: List[Tuple[int, str, int, int]] = []
    pos = 0
    idx = 0

    def emit(label: str, block: str) -> None:
        nonlocal pos, idx
        if spans:
            pos += 1  # the "\n" joiner between blocks
        spans.append((idx, label, pos, pos + len(block)))
        pos += len(block)
        idx += 1

    for item, _level in doc.iterate_items(doc.body, with_groups=False):
        if isinstance(item, TextItem) and item.text:
            emit(item.label, item.text)
        elif isinstance(item, TableItem):
            for row in item.data.grid():
                emit("table_row", "\t".join(c.text for c in row))
    return spans
